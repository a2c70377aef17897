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
from rs_query_engine_spark.sources.corpus import spread


def _hash_hex8(expr: Column) -> Column:
    """First 8 md5 hex chars → bigint in [0, 2^32). Identical in
    DuckDB: ``('0x' || substr(md5(x),1,8))::BIGINT``."""
    return F.conv(F.substring(F.md5(expr), 1, 8), 16, 10).cast("bigint")


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup on normalized text: keep the smallest id per
    fingerprint, report cluster size."""
    df = spread(df)
    return (
        df.select(F.col(id_col), F.md5(normalize_text(F.col(text_col))).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# smallest prime above 2^32 — modulus of the affine MinHash family
MINHASH_PRIME = 4294967311


def minhash_signature(
    text: Column, num_hashes: int = 16, shingle_n: int = 3
) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``) over
    word ``shingle_n``-gram shingles.

    Hash family: ONE md5 base hash per shingle (first 8 hex chars →
    bigint < 2^32), then ``num_hashes`` affine perturbations
    ``h_i(x) = ((2i+1)·x + (7919i+17)) mod MINHASH_PRIME`` — the
    textbook universal family, deterministic and oracle-expressible.

    Built as a SINGLE array pass: ``F.aggregate`` folds the base-hash
    array into a ``num_hashes``-wide running-min accumulator
    (``zip_with(acc, affines(x), least)``), so the shingle/md5
    subexpression appears exactly once in the plan. The naive form —
    ``array(*[array_min(transform(sh, hash_i)) ...])`` — embeds the
    shingle expression ``num_hashes`` times and re-evaluates it per
    hash (measured 8× slower at sf0.1); nesting the base-hash array
    inside an outer ``transform`` lambda is equally bad because HOF
    lambda bodies re-evaluate their captured subtrees per element.

    Empty shingle sets keep the init accumulator [2^33]*num (never
    collides with real hashes < 2^32)."""

    return _minhash_from_shingles(
        F.array_distinct(shingles(text, shingle_n)), num_hashes
    )


def _minhash_from_shingles(sh: Column, num_hashes: int) -> Column:
    """Signature from an already-computed (distinct) shingle array —
    lets callers that also need the shingle set stage it in a prior
    projection so it is computed once (see :func:`minhash_signature`
    for the hash family and the single-pass rationale)."""

    def affines(x: Column) -> Column:
        return F.array(
            *[
                (F.lit(2 * i + 1) * x + F.lit(7919 * i + 17)) % F.lit(MINHASH_PRIME)
                for i in range(num_hashes)
            ]
        )

    hs = F.transform(sh, lambda s: _hash_hex8(s))
    return F.aggregate(
        hs,
        F.array_repeat(F.lit(2**33).cast("bigint"), num_hashes),
        lambda acc, x: F.zip_with(acc, affines(x), lambda m, h: F.least(m, h)),
    )


def _pairs_within(docs: Column) -> Column:
    """All unordered pairs from a bucket's ``array<struct<_id,_sh>>``,
    as ``array<struct<id_a,id_b,sh_a,sh_b>>`` with id_a < id_b.

    Positional (i, j>i) expansion via a two-arg (element, index)
    transform + slice; each struct is emitted id-ordered so downstream
    dedup/compare is canonical. Pair count is quadratic in bucket size
    — callers bucket by an LSH band key or blocking key precisely so
    buckets stay near-dup-cluster-sized."""
    return F.flatten(
        F.transform(
            docs,
            lambda d1, i: F.transform(
                F.slice(docs, i + 2, F.greatest(F.size(docs) - i - 1, F.lit(0))),
                lambda d2: F.when(
                    d1["_id"] < d2["_id"],
                    F.struct(
                        d1["_id"].alias("id_a"),
                        d2["_id"].alias("id_b"),
                        d1["_sh"].alias("sh_a"),
                        d2["_sh"].alias("sh_b"),
                    ),
                ).otherwise(
                    F.struct(
                        d2["_id"].alias("id_a"),
                        d1["_id"].alias("id_b"),
                        d2["_sh"].alias("sh_a"),
                        d1["_sh"].alias("sh_b"),
                    )
                ),
            ),
        )
    )


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
    # stage shingles in their own projection so the expensive shingle
    # construction runs once per row (CollapseProject keeps expensive
    # multi-referenced producer expressions un-inlined), then
    # localCheckpoint: sh_df is consumed three times (signature + the
    # two verification joins) and the checkpoint stores the raw rows
    # via the block manager (memory-and-disk, no columnar re-encode —
    # unlike persist(), whose columnar cache build of array<string>
    # measured 4× the whole query; the checkpoint measured ~1.7×
    # faster end-to-end than recomputing the projection three times)
    sh_df = (
        spread(df)
        .select(
            F.col(id_col).alias("_id"),
            F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
        )
        .localCheckpoint()
    )
    # docs with no complete shingle share the sentinel signature and
    # would all collide into one degenerate bucket (and 0/0 Jaccard);
    # they can never clear a positive threshold, so drop them here
    sig = sh_df.filter(F.size("_sh") > 0).select(
        "_id", _minhash_from_shingles(F.col("_sh"), num_hashes).alias("_sig")
    )
    banded = sig.select(
        "_id",
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
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # candidate generation: bucket by (band, key) and pair WITHIN each
    # bucket, instead of a banded self-join. Only (id, band, key) rides
    # the shuffle — shingle sets would multiply shuffle bytes by the
    # document size and dominated the wall clock when carried here.
    # Bucket sizes track true near-dup cluster sizes, so the per-bucket
    # pair expansion stays tiny; at 100 TB, cap bucket size before the
    # expansion to guard against degenerate keys (e.g. empty docs).
    buckets = (
        banded.groupBy("band", "key")
        .agg(F.collect_list("_id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    pairs = (
        buckets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        F.col("ids"),
                        lambda d1, i: F.transform(
                            F.slice(
                                F.col("ids"),
                                i + 2,
                                F.greatest(F.size("ids") - i - 1, F.lit(0)),
                            ),
                            lambda d2: F.struct(
                                F.least(d1, d2).alias("id_a"),
                                F.greatest(d1, d2).alias("id_b"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select("p.*")
        .dropDuplicates(["id_a", "id_b"])
    )
    # verification: fetch shingle sets for the (tiny) candidate set —
    # exact Jaccard runs only on candidates; AQE turns both joins into
    # broadcasts once it sees the candidate-set size at runtime
    a = sh_df.select(F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"))
    b = sh_df.select(F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"))
    cand = b.join(a.join(pairs, "id_a"), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    # try_divide: defensive against 0/0 if a caller lowers the
    # threshold to 0 and empty sets reach verification
    jac = F.try_divide(inter.cast("double"), union)
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
    t = spread(df).select(
        F.col(id_col).alias("_id"),
        F.array_join(F.slice(tokens(F.col(text_col)), 1, prefix_tokens), " ").alias("_blk"),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"),
    ).filter(F.size("_sh") > 0)  # empty docs all share block "" → degenerate bucket + 0/0 Jaccard
    # bucket by blocking key and pair within buckets (same shape as
    # minhash_lsh_pairs): one shingle pass + one shuffle instead of a
    # self-join that recomputes and reshuffles the shingle projection
    # per side
    buckets = (
        t.groupBy("_blk")
        .agg(F.collect_list(F.struct("_id", "_sh")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    pairs = buckets.select(F.explode(_pairs_within(F.col("docs"))).alias("p")).select(
        "p.*"
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.select(
            "id_a", "id_b", F.try_divide(inter.cast("double"), union).alias("jaccard")
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
    )
