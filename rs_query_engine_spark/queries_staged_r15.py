"""Staged query registrations for ROUND 16 — the round-15 holding pen.

EMPTY at creation (round-13 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r15_parity.py``, the
``STAGED_R15_ENABLED`` flag, and the ``_PEN_MODULES`` entry all
exist BEFORE the first round-15 query lands, so every registration
is verified-by-construction from its first commit). Round 14 fills
this pen (≤ ~15 queries — the rotation-backlog cap, see the
BENCH_NOTES ledger) while activating the r13 one; round 16 flips
the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 14 (from round-13 loose ends — evaluate,
don't assume):

- **SQL surfaces are CLOSED as of the r13/r14 pens**: WITH
  RECURSIVE/UnionLoop, SQL UDFs + table function, SQL scripting,
  pipe syntax, LATERAL, Observation API (r13 pen); GROUP BY ALL,
  named parameters, IDENTIFIER(), EXECUTE IMMEDIATE (r14 pen).
  Nothing known remains — scan Spark release notes before assuming.
- **Python-compute tiers are CLOSED**: row UDTF (fixed +
  polymorphic), pandas scalar/grouped-agg/grouped-apply,
  mapInPandas, mapInArrow, applyInArrow, applyInPandasWithState,
  Arrow-batch DataSources. ``transformWithStateInPandas`` remains
  BLOCKED (hard ``google.protobuf`` import — do not re-probe unless
  protobuf appears in the image).
- **Source/sink formats**: parquet, CSV, JSON, ORC, XML, text,
  memory, rate-micro-batch, Python DataSources, quarantine pairs,
  foreachBatch upsert all live or penned; ``binaryFile`` SEEDED
  below (round 13). Avro measured BLOCKED (round 13): pip pyspark
  does not bundle spark-avro — do not re-probe unless the jar
  appears in the image.
- **A bucketed-broadcast hybrid similarity join** if a plan audit
  surfaces a shuffle worth removing (carried since r11 — none found
  in the r11/r12/r13 audits).
- The rows-only trio (``similarity_ivf_kmeans``,
  ``agg_approx_percentile``, ``text_unigram_logprob``) stays
  rows-only by design with invariant companions — re-evaluate only
  if one becomes exactly oracle-able.
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r15 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-15
    staged registry (merged live when STAGED_R15_ENABLED flips)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)


# ---------------------------------------------------------------------------
# binaryFile source — whole-file ingestion with content fingerprints
# ---------------------------------------------------------------------------
# Avro probe (round 13, measured): `write.format("avro")` fails with
# "Failed to find data source: avro ... external data source module
# since Spark 2.4" — the pip pyspark image does not bundle
# spark-avro and the container has no package download, so the Avro
# surface is BLOCKED. Do not re-probe unless the jar appears.

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rs_query_engine_spark.queries import _t  # noqa: E402


@register_staged(
    "source_binary_files",
    oracle="""
    WITH lines AS (
        SELECT lang,
               string_agg(CAST(doc_id AS VARCHAR) || ','
                          || CAST(n_chars AS VARCHAR),
                          chr(10) ORDER BY doc_id) || chr(10) AS body
        FROM documents GROUP BY lang
    )
    SELECT lang,
           CAST(octet_length(CAST(body AS BLOB)) AS BIGINT) AS n_bytes,
           md5(body) AS content_md5
    FROM lines
    """,
)
def source_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` source — whole-file ingestion (the format
    multimodal lakes use for images/audio and ops tooling uses for
    manifest audits): one deterministic CSV file per language is
    materialized once per corpus generation (integer-only content,
    rows sorted by doc_id — byte-exact serialization both engines can
    state), then read back as OPAQUE BINARY and fingerprinted
    (length + md5 over raw bytes, lang recovered from the
    partitioned path). The oracle reconstructs each file's exact
    bytes with string_agg and fingerprints them in SQL — pinning
    that Spark's whole-file read is byte-faithful end-to-end.

    Determinism note (why this layout): a per-FILE result is only
    oracle-able if file contents are content-deterministic, so the
    fixture repartitions by lang (each lang's rows land in ONE task)
    and sorts within partitions — partitionBy then emits exactly one
    sorted file per lang regardless of cluster size. modificationTime
    is never selected (wall-clock). 100-TB shape: binaryFile scans
    parallelize per file; the projection carries (path, length,
    content) only as far as the map-side fingerprint — nothing
    byte-sized crosses a shuffle."""
    import os

    from rs_query_engine_spark.sources.artifacts import (
        artifact_root,
        install_artifact,
    )

    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    # v2: sort moved after the projection (ADVICE r13) — same bytes,
    # re-keyed so cached v1 fixtures rebuild through the hardened path.
    root = artifact_root(src, "binfiles", "layout=lang_csv_sorted_v2")
    path = os.path.join(root, "byte_files")

    def _complete(r: str) -> bool:
        return os.path.exists(os.path.join(r, "byte_files", "_SUCCESS"))

    if not _complete(root):

        def _write(tmp: str) -> None:
            # The sort is the LAST node before the write and orders by
            # (lang, doc_id-recomputed-from-value), so the writer's
            # required ordering on the partition column is satisfied
            # by the sort itself — no reliance on outputOrdering
            # propagating through a later projection (ADVICE r13: that
            # propagation is an implementation detail a Spark upgrade
            # could drop, silently letting FileFormatWriter insert its
            # own non-stable sort and scramble the file bytes).
            (
                _t(spark, sf_dir, "documents")
                .select(
                    "lang",
                    F.concat_ws(
                        ",",
                        F.col("doc_id").cast("string"),
                        F.col("n_chars").cast("string"),
                    ).alias("value"),
                )
                .repartition(F.col("lang"))
                .sortWithinPartitions(
                    F.col("lang"),
                    F.split(F.col("value"), ",").getItem(0).cast("long"),
                )
                .write.partitionBy("lang")
                .text(os.path.join(tmp, "byte_files"))
            )
            # Byte-exactness also needs each lang's rows in ONE file
            # (repartition-by-lang guarantees one task per lang, hence
            # one file) — assert it so a layout drift fails the
            # install loudly instead of hash-mismatching downstream.
            out = os.path.join(tmp, "byte_files")
            for d in os.listdir(out):
                if not d.startswith("lang="):
                    continue
                n = len([
                    f for f in os.listdir(os.path.join(out, d))
                    if f.endswith(".txt")
                ])
                if n != 1:
                    raise AssertionError(
                        f"binaryFile fixture: {d} has {n} data files,"
                        " expected exactly 1"
                    )

        install_artifact(root, "binfiles", src, _write, _complete)

    b = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(path)
    )
    return b.select(
        F.regexp_extract(F.col("path"), r"lang=([^/]+)/", 1).alias("lang"),
        F.col("length").alias("n_bytes"),
        F.md5(F.col("content")).alias("content_md5"),
    )


# ---------------------------------------------------------------------------
# ANSI-mode error-safe expression family (try_divide / try_cast /
# try_add) — Spark 4 ships with spark.sql.ansi.enabled=true, so the
# try_* forms ARE the production spelling of fallible arithmetic
# ---------------------------------------------------------------------------

_TRY_DIV_MOD = 7  # every 7th order gets a zero denominator


@register_staged(
    "scalar_try_ansi_family",
    oracle=f"""
    WITH t AS (
        SELECT o_orderstatus,
               CASE WHEN o_orderkey % {_TRY_DIV_MOD} = 0 THEN NULL
                    ELSE CAST(FLOOR(o_totalprice
                         / CAST(o_orderkey % {_TRY_DIV_MOD} AS DOUBLE)
                         * 100) AS BIGINT) END AS q_cents,
               TRY_CAST(o_orderpriority AS INTEGER) AS prio_raw,
               TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER)
                   AS prio_num,
               CASE WHEN o_orderkey <= 0
                    THEN 9223372036854775807 + o_orderkey
                    ELSE NULL END AS overflowed
        FROM orders
    )
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(q_cents) AS BIGINT) AS n_div_ok,
           CAST(SUM(q_cents) AS BIGINT) AS sum_q_cents,
           CAST(COUNT(prio_raw) AS BIGINT) AS n_prio_raw_ok,
           CAST(SUM(prio_num) AS BIGINT) AS sum_prio,
           CAST(COUNT(overflowed) AS BIGINT) AS n_overflow_ok
    FROM t GROUP BY o_orderstatus
    """,
)
def scalar_try_ansi_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The error-safe ``try_*`` expression family under ANSI mode —
    Spark 4 enables ``spark.sql.ansi.enabled`` by default (this
    session runs with it on), so plain division by zero, an invalid
    cast, or bigint overflow now RAISES mid-job; ``try_divide`` /
    ``try_cast`` / ``try_add`` are the row-level quarantine that
    keeps one poisoned row from killing a 100-TB pass. Three
    measured semantics pinned against ground truth the oracle states
    independently: division by a zero denominator → NULL (every
    {mod}th order), a non-numeric string cast → NULL while the
    digit-prefix cast succeeds, and ``try_add`` at int64 max → NULL
    on overflow (every positive orderkey overflows; the corpus's one
    zero orderkey does NOT — the oracle states that boundary, which
    is exactly the off-by-one an overflow guard must get right).

    Float discipline: the only double op chain is
    price / k * 100 → FLOOR, written in the same order on both
    sides; every aggregate is an exact int64 count/sum."""
    o = _t(spark, sf_dir, "orders")
    t = o.select(
        "o_orderstatus",
        F.floor(
            F.try_divide(
                F.col("o_totalprice"),
                (F.col("o_orderkey") % _TRY_DIV_MOD).cast("double"),
            )
            * 100
        )
        .cast("bigint")
        .alias("q_cents"),
        F.col("o_orderpriority").try_cast("int").alias("prio_raw"),
        F.col("o_orderpriority")
        .substr(1, 1)
        .try_cast("int")
        .alias("prio_num"),
        F.try_add(
            F.lit(9223372036854775807).cast("bigint"), F.col("o_orderkey")
        ).alias("overflowed"),
    )
    return t.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("q_cents").alias("n_div_ok"),
        F.sum("q_cents").alias("sum_q_cents"),
        F.count("prio_raw").alias("n_prio_raw_ok"),
        F.sum("prio_num").alias("sum_prio"),
        F.count("overflowed").alias("n_overflow_ok"),
    )


# ---------------------------------------------------------------------------
# Embedding-store referential coverage (backfill planning / orphan GC)
# ---------------------------------------------------------------------------

# Deterministic desync between the corpus and its embedding store —
# the two failure directions a real pipeline accumulates: every 11th
# embedding is MISSING (a re-embed backlog), and every 13th document
# is DELETED from the corpus (takedowns) leaving its embedding
# orphaned. One modulus per direction; both fold into the oracle.
_COV_MISS_MOD = 11  # embeddings absent for doc_id % 11 == 0
_COV_DEL_MOD = 13  # corpus rows absent for doc_id % 13 == 0


@register_staged(
    "quality_embedding_coverage",
    oracle=f"""
    WITH docs AS (
        SELECT doc_id, source FROM documents
        WHERE doc_id % {_COV_DEL_MOD} <> 0
    ),
    emb AS (
        SELECT vec_id FROM embeddings
        WHERE vec_id % {_COV_MISS_MOD} <> 0
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(e.vec_id) AS BIGINT) AS n_embedded,
           CAST(COUNT(*) - COUNT(e.vec_id) AS BIGINT) AS n_backfill,
           CAST(SUM(CASE WHEN e.vec_id IS NULL THEN d.doc_id
                         ELSE 0 END) AS BIGINT) AS backfill_key_sum,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM emb
            LEFT JOIN docs dd ON emb.vec_id = dd.doc_id
            WHERE dd.doc_id IS NULL) AS n_orphans_total
    FROM docs d LEFT JOIN emb e ON d.doc_id = e.vec_id
    GROUP BY d.source
    """,
)
def quality_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-store REFERENTIAL COVERAGE — the sync audit every
    retrieval pipeline runs before trusting its index: which corpus
    documents have no embedding (the re-embed BACKFILL, with the
    exact key-sum so the backfill job is verifiable), and how many
    embeddings point at documents that no longer exist (ORPHANS —
    storage the takedown sweep must GC, and retrieval results that
    would surface deleted content). Desync is simulated
    deterministically in both directions (one modulus each) so the
    oracle states the expected audit independently.

    Scale shape: two anti-join-shaped passes expressed as ONE left
    join per direction on the key — at 100 TB each is a single key
    shuffle (shuffle-free with both tables bucketed by key), and
    only (key, source) columns move — never text, never vectors.
    The orphan total rides the same plan as a scalar subquery."""
    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % _COV_DEL_MOD != 0)
        .select("doc_id", "source")
    )
    emb = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % _COV_MISS_MOD != 0)
        .select("vec_id")
    )
    cov = (
        docs.join(emb, docs.doc_id == emb.vec_id, "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("vec_id").alias("n_embedded"),
            (F.count(F.lit(1)) - F.count("vec_id")).alias("n_backfill"),
            F.sum(
                F.when(F.col("vec_id").isNull(), F.col("doc_id")).otherwise(
                    F.lit(0)
                )
            ).alias("backfill_key_sum"),
        )
    )
    orphans = (
        emb.join(docs, emb.vec_id == docs.doc_id, "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans_total"))
    )
    return cov.crossJoin(F.broadcast(orphans))
