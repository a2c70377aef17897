"""Staged query registrations — implemented and locally oracle-verified
in round 5, HELD OUT of the driver registry until round 6.

Why staged: the driver's correctness gate hashes only the first 50
entries of ``queries()`` per round, and round 5's window is budgeted to
the slot so that the 17 events-family queries whose last driver-green
row predates the Spark-4.1 loader rewrite all get re-hashed (VERDICT
r04 priority #1 — `events_sessionization` sits at window position 49).
Registering anything new this round would evict them. These queries
therefore live in their own registry and run through the same local
oracle-parity harness (`tests/oracle/test_staged_parity.py`, sf0.001 +
sf0.01); round 6 activates them by flipping ``STAGED_ENABLED`` in
``queries.py``, at which point they front-load into the driver window
as unverified registrations.

Float-determinism discipline is the same as ``queries.py`` (see its
module docstring): exact integer/decimal arithmetic wherever a value
feeds the cross-engine hash, raw row-level double ops only where both
engines execute the identical IEEE sequence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rs_query_engine_spark.queries import D_PRICE, QueryFn, _t

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the staged
    registry (merged into the live one when STAGED_ENABLED flips)."""

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


# =====================================================================
# Corpus management — splits, mixtures, calibration
# =====================================================================


@register_staged(
    "sample_split_assign",
    oracle="""
    SELECT doc_id, source,
           CASE WHEN b < 90 THEN 'train'
                WHEN b < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (
        SELECT doc_id, source,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                   % 100 AS b
        FROM documents
    )
    """,
)
def sample_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment (90/5/5): every
    document gets exactly one split from its content-hash bucket — the
    DISJOINT-AND-COVERING twin of the Bernoulli samplers (which filter;
    this partitions). Split membership is a pure function of doc_id,
    so it is stable under re-runs, repartitioning, engine swaps, and
    incremental corpus growth (new docs join splits at the same rates
    without reshuffling old ones) — the property that keeps eval sets
    frozen while the training set grows. Map-only; the CASE compiles
    into the scan projection, no shuffle at any scale."""
    from rs_query_engine_spark.operators.sorts import _hash_pct

    d = _t(spark, sf_dir, "documents")
    b = _hash_pct(F.col("doc_id"))
    split = (
        F.when(b < 90, F.lit("train"))
        .when(b < 95, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", "source", split.alias("split"))


@register_staged(
    "sample_topp_nucleus",
    oracle="""
    WITH s AS (
        SELECT doc_id, source, n_chars,
               CAST(SUM(n_chars) OVER (
                   PARTITION BY source
                   ORDER BY n_chars DESC, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_mass,
               CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT)
                   AS total_mass
        FROM documents
    )
    SELECT doc_id, source, n_chars, cum_mass,
           CAST(cum_mass AS DOUBLE) / CAST(total_mass AS DOUBLE) AS mass_frac
    FROM s
    WHERE (cum_mass - n_chars) * 100 < 80 * total_mass
    """,
)
def sample_topp_nucleus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-p (nucleus) corpus selection per source: rank documents by
    quality (length proxy, descending) and keep the smallest prefix
    covering 80% of each source's total character mass — the mixture-
    construction step that keeps the best of every source while
    clipping its low-quality tail, by MASS rather than by count (a
    count cutoff over-keeps short junk; a mass cutoff is what the
    token budget actually buys).

    Exactness: cumulative and total masses are BIGINT sums, the keep
    decision is pure integer arithmetic (``(cum−n)·100 < 80·total`` —
    the doc that CROSSES the threshold is kept, nucleus-style), and
    only the reported ``mass_frac`` touches doubles (one exact
    int→double conversion each, one division — bit-identical cross-
    engine). Scale: both window frames share ONE partition+order spec,
    so Catalyst evaluates them in a single Window operator over a
    single shuffle+sort of (source)-partitioned rows; no global sort,
    no driver loop."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    cum = (
        F.sum("n_chars")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_mass")
    )
    total = F.sum("n_chars").over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    s = d.select("doc_id", "source", "n_chars", cum, total.alias("_total"))
    return s.filter(
        (F.col("cum_mass") - F.col("n_chars")) * 100 < 80 * F.col("_total")
    ).select(
        "doc_id",
        "source",
        "n_chars",
        "cum_mass",
        (
            F.col("cum_mass").cast("double") / F.col("_total").cast("double")
        ).alias("mass_frac"),
    )


@register_staged(
    "text_quality_calibrate",
    oracle=r"""
    WITH s AS (
        SELECT doc_id, source,
               CAST(len(list_distinct(regexp_split_to_array(lower(text),
                                                            '\s+'))) AS BIGINT)
                   * 1000
               + CAST(len(regexp_split_to_array(lower(text), '\s+')) AS BIGINT)
                   AS score
        FROM documents
    )
    SELECT doc_id, source, score,
           percent_rank() OVER (PARTITION BY source
                                ORDER BY score, doc_id) AS pctl,
           least(9, CAST(floor(percent_rank() OVER (PARTITION BY source
                                                    ORDER BY score, doc_id)
                               * 10.0) AS BIGINT)) AS decile
    FROM s
    """,
)
def text_quality_calibrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quality-score CALIBRATION: raw quality scores are not
    comparable across sources (a median web page and a median reference
    doc score differently), so mixture policies threshold on the
    within-source percentile instead. Score is an exact integer proxy
    (type-token richness ×1000 + token count); ``percent_rank`` over
    (source, score, doc_id) is (rank−1)/(n−1) — rank arithmetic plus
    ONE double division, bit-identical cross-engine; the decile is its
    floor (ties broken by doc_id make the rank total, so no
    percent_rank plateau ambiguity). One shuffle on source, one sort,
    both window functions in one Window operator. At 100 TB the
    per-source sort is the cost — if a single source dominates, the
    production variant swaps exact percent_rank for a per-source
    quantile sketch; this exact form doubles as that sketch's
    calibration oracle."""
    from rs_query_engine_spark.functions.text import tokens

    d = _t(spark, sf_dir, "documents")
    t = tokens(F.col("text"))
    score = (
        F.size(F.array_distinct(t)).cast("bigint") * 1000
        + F.size(t).cast("bigint")
    ).alias("score")
    s = d.select("doc_id", "source", score)
    w = Window.partitionBy("source").orderBy("score", "doc_id")
    pctl = F.percent_rank().over(w)
    return s.select(
        "doc_id",
        "source",
        "score",
        pctl.alias("pctl"),
        F.least(F.lit(9), F.floor(pctl * 10.0)).alias("decile"),
    )


@register_staged(
    "text_dsir_weights",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(regexp_split_to_array(lower(text), '\s+')) AS t
        FROM documents
    ), b AS (
        SELECT doc_id, lang,
               ('0x' || substr(md5(t), 1, 8))::BIGINT % 1024 AS bucket
        FROM tok
    ), stats AS (
        SELECT bucket,
               CAST(COUNT(*) AS BIGINT) AS n_all,
               CAST(COUNT(CASE WHEN lang = 'en' THEN 1 END) AS BIGINT)
                   AS n_tgt
        FROM b GROUP BY bucket
    )
    SELECT b.doc_id,
           CAST(SUM(s.n_tgt) AS BIGINT) AS tgt_mass,
           CAST(SUM(s.n_all) AS BIGINT) AS all_mass,
           CAST(CAST(SUM(s.n_tgt) AS BIGINT) AS DOUBLE)
               / CAST(CAST(SUM(s.n_all) AS BIGINT) AS DOUBLE) AS weight
    FROM b JOIN stats s USING (bucket)
    GROUP BY b.doc_id
    """,
)
def text_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-flavored importance weighting (Xie et al., 2023: Data
    Selection via Importance Resampling): score every document by how
    much its hashed n-gram feature mass comes from the TARGET
    distribution (here: lang='en' documents as the target domain).
    Tokens hash into 1024 feature buckets; per bucket the corpus pass
    counts total and target occurrences; a document's weight is
    Σ n_tgt(bucket(t)) / Σ n_all(bucket(t)) over its tokens — high
    when its vocabulary concentrates where the target's does. (True
    DSIR exponentiates a log-likelihood ratio; the ratio-of-masses
    form keeps every hashed feature and stays in exact integer
    arithmetic until one final division, so it is hash-verifiable
    cross-engine — libm-free by design.)

    Scale: the feature table is ≤1024 rows — BROADCAST — so the
    per-token join is map-side; both aggregations are hash aggregates
    with map-side partials. Two passes over the token stream, zero
    all-pairs anything."""
    from rs_query_engine_spark.functions.text import tokens
    from rs_query_engine_spark.sources.corpus import spread

    d = spread(_t(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("t")
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("t")), 1, 8), 16, 10).cast("bigint")
        % 1024
    )
    b = tok.select("doc_id", "lang", bucket.alias("bucket"))
    stats = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(F.col("lang") == "en", F.lit(1))).alias("n_tgt"),
    )
    per_doc = (
        b.join(F.broadcast(stats), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n_tgt").alias("tgt_mass"),
            F.sum("n_all").alias("all_mass"),
        )
    )
    return per_doc.select(
        "doc_id",
        "tgt_mass",
        "all_mass",
        (
            F.col("tgt_mass").cast("double") / F.col("all_mass").cast("double")
        ).alias("weight"),
    )


# =====================================================================
# Sketches — Count-Min heavy hitters (exact-verified)
# =====================================================================


@register_staged(
    "agg_countmin_heavy",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS t
        FROM documents
    ), cells AS (
        SELECT r.j,
               ('0x' || substr(md5(r.j || '|' || tok.t), 1, 8))::BIGINT % 64
                   AS bucket
        FROM tok, (VALUES (0), (1), (2)) r(j)
    ), sketch AS (
        SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS c
        FROM cells GROUP BY j, bucket
    ), exact AS (
        SELECT t AS token, CAST(COUNT(*) AS BIGINT) AS exact_n
        FROM tok GROUP BY t
    ), heavy AS (
        SELECT token, exact_n FROM exact
        WHERE exact_n * 200 >= (SELECT COUNT(*) FROM tok)
    ), est AS (
        SELECT h.token, MIN(s.c) AS cm_est
        FROM heavy h, (VALUES (0), (1), (2)) r(j)
        JOIN sketch s
          ON s.j = r.j
         AND s.bucket =
             ('0x' || substr(md5(r.j || '|' || h.token), 1, 8))::BIGINT % 64
        GROUP BY h.token
    )
    SELECT h.token, h.exact_n, e.cm_est, e.cm_est - h.exact_n AS overcount
    FROM heavy h JOIN est e USING (token)
    """,
)
def agg_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters with an EXACT verification join: build a
    3×64 Count-Min grid over the corpus token stream
    (``operators.sketches``), estimate the frequency of every token
    whose true share is ≥0.5%, and report estimate vs exact count. The
    overcount column is ≥0 for every row BY CONSTRUCTION (collisions
    only add) — a cross-engine-hashable witness of the sketch's
    one-sided error, the same convert-ran-into-provably-right pattern
    as ``agg_freq_items``.

    Why it matters at 100 TB: the grid is a ``depth × width`` partial
    aggregate that merges cell-wise — per-partition/day/source sketches
    roll up without touching raw data, and the grid (192 cells) is
    broadcast for estimation, so probing costs one map-side join. The
    deterministic md5 rows make the whole pipeline — grid AND
    estimates — bit-reproducible, which production monitoring wants
    (alert thresholds on estimates must not flap across reruns)."""
    from rs_query_engine_spark.functions.text import tokens
    from rs_query_engine_spark.operators.sketches import (
        countmin_estimate,
        countmin_sketch,
    )
    from rs_query_engine_spark.sources.corpus import spread

    d = spread(_t(spark, sf_dir, "documents"))
    tok = d.select(F.explode(tokens(F.col("text"))).alias("t"))
    # localCheckpoint: the token stream feeds three consumers (sketch,
    # exact counts, total) — tokenize once, not thrice
    tok = tok.localCheckpoint()
    sketch = countmin_sketch(tok, "t", depth=3, width=64)
    exact = tok.groupBy(F.col("t").alias("token")).agg(
        F.count(F.lit(1)).alias("exact_n")
    )
    total = tok.agg(F.count(F.lit(1)).alias("_total"))
    heavy = exact.join(F.broadcast(total)).filter(
        F.col("exact_n") * 200 >= F.col("_total")
    )
    est = countmin_estimate(sketch, heavy, "token", depth=3, width=64)
    return (
        heavy.join(est, "token")
        .select(
            "token",
            "exact_n",
            "cm_est",
            (F.col("cm_est") - F.col("exact_n")).alias("overcount"),
        )
    )


# =====================================================================
# Data layout — Z-order clustering for scan pruning
# =====================================================================


@register_staged(
    "layout_zorder_cluster",
    oracle=None,  # generated below (bit-interleave terms shared with Spark)
)
def layout_zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER layout rewrite, measured: interleave the low 8 bits of
    (l_partkey mod 256, l_suppkey mod 256) into a Morton code, assign
    rows to 256 target files by the code's high bits (a range
    partitioning of the curve), and emit each file's row count and
    min/max span in BOTH dimensions — exactly the parquet footer
    statistics a scan would prune on after ``OPTIMIZE ZORDER BY
    (l_partkey, l_suppkey)``. Narrow spans in both columns ⇒ a
    predicate on EITHER column skips most files; a plain sort would
    give one narrow span and one full-range span.

    All integer bit arithmetic (shift/mask/add of disjoint bit terms),
    so the layout decision hash-verifies cross-engine. Map-only
    until one hash aggregate with map-side partials (256 groups);
    production follows with ``repartitionByRange(z).
    sortWithinPartitions(z)`` before the write — the decision logic is
    identical, only the sink differs."""
    from rs_query_engine_spark.operators.layout import zorder_file_stats

    li = _t(spark, sf_dir, "lineitem")
    return zorder_file_stats(
        li,
        (F.col("l_partkey") % 256).alias("x"),
        (F.col("l_suppkey") % 256).alias("y"),
        bits=8,
        file_shift=8,
    )


def _zorder_oracle() -> str:
    from rs_query_engine_spark.operators.layout import zorder_key_sql

    z = zorder_key_sql("(l_partkey % 256)", "(l_suppkey % 256)", bits=8)
    return f"""
    WITH t AS (
        SELECT (l_partkey % 256) AS x, (l_suppkey % 256) AS y,
               ({z}) AS z
        FROM lineitem
    )
    SELECT z >> 8 AS file_id, COUNT(*) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x,
           MIN(y) AS min_y, MAX(y) AS max_y
    FROM t GROUP BY file_id
    """


_ORACLE["layout_zorder_cluster"] = _zorder_oracle()


# =====================================================================
# Streaming — stream-static dimension enrichment
# =====================================================================


@register_staged(
    "stream_static_enrich",
    oracle="""
    SELECT n.n_name,
           COUNT(e.event_id) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events e
    JOIN nation n ON e.user_id % 25 = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC enrichment join: the event stream joins a static
    dimension snapshot (nation, keyed by user_id mod 25 — standing in
    for the user→geo dimension) and aggregates per dimension value —
    the canonical streaming-ETL shape (enrich, then aggregate). The
    static side is broadcast: each micro-batch joins map-side with NO
    stream-side shuffle before the aggregation, and the dimension can
    be swapped between batches in production (foreachBatch re-read)
    without touching stream state. Counts and decimal-exact sums make
    the final state hash-comparable to the batch oracle — batch/stream
    parity by construction, same discipline as the rest of the
    streaming family."""
    from rs_query_engine_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
    )

    ev = read_events_stream(spark, sf_dir)
    dim = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("_nk"), "n_name"
    )
    enriched = ev.withColumn("_nk", F.col("user_id") % 25).join(
        F.broadcast(dim), "_nk"
    )
    agg = enriched.groupBy("n_name").agg(
        F.count("event_id").alias("n_events"),
        F.sum(F.col("value").cast(D_PRICE)).cast("double").alias("total_value"),
    )
    return run_stream_to_memory(
        agg, "stream_static_enrich", output_mode="complete"
    )
