"""Deduplication operators for LLM-data pipelines (north-star ops):
exact, MinHash+LSH, SimHash, n-gram Jaccard — over a text corpus like
the ``documents`` table.

Design for 100 TB:
- **Exact**: md5-fingerprint groupBy — one shuffle on the fingerprint;
  map-side partial aggregation collapses per-partition duplicates
  first.
- **MinHash+LSH**: per-doc signatures are computed in a single
  projection (no shuffle, no UDF — md5/array built-ins only); the LSH
  band join shuffles on (band_idx, band_key), so candidate generation
  is O(duplicate clusters), never the O(n²) all-pairs join.
  Candidates are then verified with exact Jaccard — only on the tiny
  candidate set.
- **SimHash**: one projection producing a compact integer signature;
  near-dup candidates come from an equi-join on rotated bit-blocks
  (not implemented here — signature + hamming verify on blocked pairs).
- **n-gram Jaccard**: exact pairwise similarity, made scalable by a
  *blocking key* equi-join (same token prefix) instead of a cross
  join.

Determinism: all hashes derive from md5 hex (engine-independent), so
every operator here is oracle-checkable in DuckDB with the same
construction. Hash value = first 8 md5 hex chars as a bigint
(unsigned 32-bit range — no sign issues).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rs_query_engine_spark.functions.text import normalize_text, shingles, tokens


def _hash_hex8(expr: Column) -> Column:
    """First 8 md5 hex chars → bigint in [0, 2^32). Identical in
    DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``."""
    return F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on normalized text: keep the smallest id per
    fingerprint, report cluster size."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def minhash_signature(
    text: Column, num_hashes: int = 16, shingle_n: int = 3
) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``) over
    word ``shingle_n``-gram shingles. Hash family i is
    ``md5(i || '|' || shingle)`` — deterministic, engine-independent.
    Empty shingle sets get sentinel signature [2^33]*num (never
    collides with real hashes < 2^32)."""
    sh = F.array_distinct(shingles(text, shingle_n))
    sentinel = F.lit(2**33)

    def hasher(i: int):
        # note: a `lambda s, i=i` would be mis-read by PySpark as an
        # (element, index) two-arg lambda — close over i instead
        return lambda s: _hash_hex8(F.concat(F.lit(f"{i}|"), s))

    mins = [
        F.coalesce(F.array_min(F.transform(sh, hasher(i))), sentinel)
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash + banded LSH + exact-Jaccard
    verification.

    Pipeline: signature projection → explode into ``bands`` band keys
    → self-equi-join on (band, key) → distinct candidate pairs →
    exact Jaccard on shingle sets → threshold filter. Returns
    (id_a, id_b, jaccard) with id_a < id_b.
    """
    rows = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("_sig"),
    )
    banded = sig.select(
        "_id",
        "_sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws("-", *[F.col("_sig")[b * rows + r] for r in range(rows)]).alias(
                            "key"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sh", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._sh").alias("sh_a"),
            F.col("b._sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter.cast("double") / union
    return (
        cand.select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash signature (bigint, ``bits`` wide) over word tokens.

    Per token: 32-bit md5-derived hash; signature bit j is set when
    the sum over tokens of (bit_j ? 1 : -1) is positive — computed as
    2 * (#tokens with bit j) > #tokens, all with array built-ins."""
    toks = tokens(text)
    h = F.transform(toks, lambda t: _hash_hex8(t))
    n = F.size(toks)

    def bit_set(j: int):
        # closure, not a default arg — see note in minhash_signature
        return lambda x: F.shiftright(x, j).bitwiseAND(F.lit(1)) == 1

    bit_terms = [
        F.when(
            F.lit(2) * F.size(F.filter(h, bit_set(j))) > n,
            F.lit(2**j).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
        for j in range(bits)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    prefix_tokens: int = 8,
    jaccard_threshold: float = 0.3,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with prefix *blocking*: only
    doc pairs sharing their first ``prefix_tokens`` tokens are
    compared — an equi-join on the blocking key instead of a cross
    join (the blocking key can be swapped for any cheap canopy)."""
    t = df.select(
        F.col(id_col).alias("_id"),
        F.array_join(F.slice(tokens(F.col(text_col)), 1, prefix_tokens), " ").alias("_blk"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    )
    a, b = t.alias("a"), t.alias("b")
    inter = F.size(F.array_intersect(F.col("a._sh"), F.col("b._sh")))
    union = F.size(F.col("a._sh")) + F.size(F.col("b._sh")) - inter
    return (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
