"""Staged query registrations for ROUND 10 — implemented and locally
oracle-verified in round 9, HELD OUT of the driver registry until the
round-10 window has budget.

Why staged: round 9's 50-row driver window is exactly committed — the
10 round-8 staged activations front-load as unverified, leaving 40
re-check slots that must cover every r4/r5-stamped row. Any further
registration would evict a re-check (VERDICT r06 #5 / CLAUDE.md
rotation note). These queries run through the same local
oracle-parity harness (``tests/oracle/test_staged_r9_parity.py``,
sf0.001 + sf0.01) and activate in round 10 by flipping
``STAGED_R9_ENABLED`` in ``queries.py``.

Round-9 pen (VERDICT r08 next-round #4) — 15 queries, all with exact
oracles. The two candidates the r7 brief named and r8 skipped lead:
the PERSISTED bucketed LSH index (``operators/lsh_index.py``) as a
full lifecycle — build/read-back, batch probe with no corpus
recompute (the real incremental-ingest shape at 100 TB), LSM-style
merge generation, bucket-health stats, and a streaming foreachBatch
probe — and the IVF recall-vs-nprobe audit (recall@10 at nprobe
1/2/4 vs brute force from one assignment pass). Plus TPC-H shape
coverage (Q2/Q13/Q22 analogues), explicit-values pivot,
deterministic md5-bucket train/val/test split, rolling 7-day DAU,
join-key skew diagnostics, content-defined chunking
(``functions/text.cdc_chunk_stats``), and the hashing-trick
vectorizer.

Float-determinism discipline matches ``queries.py`` (see its module
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from rs_query_engine_spark.session import truncate_lineage

from rs_query_engine_spark.operators.dedup import (
    MINHASH_MAX_BUCKET,
    MINHASH_NUM_HASHES,
)
from rs_query_engine_spark.operators.lsh_index import BATCH_MOD, BATCH_REM
from rs_query_engine_spark.queries import _COS_SQL, _MH_BANDS, _MH_SIG, D_PRICE, QueryFn, _t

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r9 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-9
    staged registry (merged live when STAGED_R9_ENABLED flips)."""

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
# Persisted LSH index + indexed incremental dedup (VERDICT r08 #4's
# first named candidate; operators/lsh_index.py holds the artifact
# machinery — reference point: the catalog surface src/catalog.rs:16-42
# extended to a maintained artifact)
# =====================================================================

# DuckDB mirror of the index build: shingle → md5 base hash → affine
# MinHash signature (fragments generated from dedup.py's production
# constants via queries._minhash_sql_parts — never a stale copy) →
# banded postings over the non-batch corpus slice, degenerate buckets
# dropped at MINHASH_MAX_BUCKET. Shared by both index queries so the
# build and the probe can never drift apart.
_LSH_IDX_CTES = rf"""
    sh AS (
        SELECT doc_id,
               list_distinct(
                   list_transform(
                       generate_series(1, len(regexp_split_to_array(lower(text), '\s+')) - 2),
                       i -> array_to_string(regexp_split_to_array(lower(text), '\s+')[i:i+2], ' ')
                   )
               ) AS sh
        FROM documents
    ), hashed AS (
        SELECT doc_id,
               list_transform(sh, s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
        FROM sh WHERE len(sh) > 0
    ), sig AS (
        SELECT doc_id,
               {_MH_SIG}
        FROM hashed
    ), banded AS (
        SELECT doc_id, b.band, b.key FROM sig,
        LATERAL (VALUES {_MH_BANDS}) AS b(band, key)
    ), idx AS (
        SELECT doc_id, band, key FROM banded
        WHERE doc_id % {BATCH_MOD} <> {BATCH_REM}
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= {MINHASH_MAX_BUCKET}
    )
"""


@register_staged(
    "dedup_lsh_index_build",
    oracle=f"""
    WITH {_LSH_IDX_CTES}
    SELECT doc_id, band, key FROM idx
    """,
)
def dedup_lsh_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-and-read-back of the PERSISTED MinHash-LSH index
    (operators/lsh_index.py): banded postings (doc_id, band, key) over
    the already-ingested corpus slice (every doc except the
    ``doc_id % 20 == 7`` stand-in batch), written ONCE as parquet
    partitioned by band (plus a parallel signature table), cache-keyed
    on the source's mtime and installed by atomic rename. The query
    returns the READ-BACK artifact — so a hash-PASS proves the
    persisted index round-trips bit-exactly, not just that the
    in-memory pipeline is right.

    100-TB shape: the index is the asset that makes ingest
    incremental — signatures are computed once per document ever (the
    batch pipeline recomputes them per run); the build is one corpus
    scan + one (band,key) shuffle for the degenerate-bucket cap; at
    cluster scale the bands table is additionally bucketed by key so
    probe joins are shuffle-free. Reference analogue: the catalog's
    register/lookup surface (src/catalog.rs:16-42) extended to a
    maintained artifact."""
    from rs_query_engine_spark.operators.lsh_index import (
        ensure_lsh_index,
        read_index_bands,
    )

    root = ensure_lsh_index(spark, sf_dir)
    return read_index_bands(spark, root)


_SIG_MATCH = " + ".join(
    f"CASE WHEN a.h{i} = e.h{i} THEN 1 ELSE 0 END"
    for i in range(MINHASH_NUM_HASHES)
)


@register_staged(
    "dedup_incremental_indexed",
    oracle=f"""
    WITH {_LSH_IDX_CTES},
    bband AS (
        SELECT doc_id, band, key FROM banded
        WHERE doc_id % {BATCH_MOD} = {BATCH_REM}
    ), cand AS (
        SELECT DISTINCT b.doc_id AS batch_id, i.doc_id AS match_id
        FROM bband b JOIN idx i ON b.band = i.band AND b.key = i.key
    ), est AS (
        SELECT c.batch_id, c.match_id, ({_SIG_MATCH}) AS n_match
        FROM cand c
        JOIN sig a ON a.doc_id = c.batch_id
        JOIN sig e ON e.doc_id = c.match_id
    ), m AS (
        SELECT batch_id, COUNT(*) AS n_matches FROM est
        WHERE 2 * n_match >= {MINHASH_NUM_HASHES}
        GROUP BY batch_id
    )
    SELECT d.doc_id, CAST(COALESCE(m.n_matches, 0) AS BIGINT) AS n_matches,
           m.batch_id IS NULL AS admitted
    FROM documents d LEFT JOIN m ON d.doc_id = m.batch_id
    WHERE d.doc_id % {BATCH_MOD} = {BATCH_REM}
    """,
)
def dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup against the PERSISTED LSH index — the
    100-TB daily-crawl shape ``dedup_incremental`` approximates with a
    fingerprint anti-join, done properly: the new batch (every 20th
    doc) computes signatures for ITS OWN documents only, probes the
    index's banded postings with a (band, key) equi-join, and verifies
    candidates by signature-component agreement (≥ half of the 16
    MinHash components — the standard estimated-Jaccard ≥ 0.5 gate)
    read from the index's signature table. Corpus text is never
    re-read and corpus signatures are never recomputed: per-batch cost
    is O(batch + candidates), independent of corpus size.

    Returns one row per batch doc: (doc_id, n_matches, admitted) —
    docs with no shingles never match and are admitted. No broadcast
    hint on the probe join: the batch side is bounded per ingest but
    still SF-proportional here, so AQE picks (it broadcasts the batch
    at any realistic batch:corpus ratio); the integer component-match
    threshold keeps the gate float-free on both engines."""
    from rs_query_engine_spark.operators.lsh_index import (
        ensure_lsh_index,
        probe_index,
    )

    root = ensure_lsh_index(spark, sf_dir)
    batch = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") % BATCH_MOD == BATCH_REM
    )
    # checkpoint=True: the batch signature projection (the expensive
    # md5 work) feeds BOTH the band probe and the component-match
    # verify — one materialization instead of hashing the batch text
    # twice (same localCheckpoint trade documented in dedup.py's
    # module docstring; batch-sized, so the executor-storage risk is
    # small)
    return probe_index(spark, root, batch, checkpoint=True)


# =====================================================================
# IVF recall-vs-nprobe audit (VERDICT r08 #4's second named candidate;
# companion to tests/unit/test_similarity_recall.py, but driver-
# verified with an exact-count oracle)
# =====================================================================

_IVF_TOPK_SQL = """
        SELECT {n} AS nprobe, query_id, vec_id FROM (
            SELECT query_id, vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY cos DESC, vec_id
                   ) AS rnk
            FROM cand WHERE pr <= {n}
        ) t{n} WHERE rnk <= 10
"""


@register_staged(
    "similarity_ivf_recall_audit",
    oracle=f"""
    WITH corpus AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ), cent AS (
        SELECT vec_id AS centroid_id, embedding::DOUBLE[] AS cv
        FROM embeddings WHERE vec_id < 8
    ), ranked AS (
        SELECT corpus.vec_id, corpus.v, cent.centroid_id,
               ROW_NUMBER() OVER (
                   PARTITION BY corpus.vec_id
                   ORDER BY {_COS_SQL.format(a="corpus.v", b="cent.cv")} DESC, cent.centroid_id
               ) AS rn
        FROM corpus, cent
    ), assigned AS (
        SELECT vec_id, v, centroid_id FROM ranked WHERE rn = 1
    ), probes AS (
        SELECT vec_id AS query_id, v AS qv, centroid_id, rn AS pr
        FROM ranked WHERE rn <= 4 AND vec_id % 100 = 0
    ), cand AS (
        SELECT p.query_id, a.vec_id,
               {_COS_SQL.format(a="a.v", b="p.qv")} AS cos, p.pr
        FROM assigned a JOIN probes p ON a.centroid_id = p.centroid_id
    ), ivf AS (
        {_IVF_TOPK_SQL.format(n=1)}
        UNION ALL
        {_IVF_TOPK_SQL.format(n=2)}
        UNION ALL
        {_IVF_TOPK_SQL.format(n=4)}
    ), q AS (
        SELECT vec_id AS query_id, v AS qv FROM corpus WHERE vec_id % 100 = 0
    ), brute AS (
        SELECT query_id, vec_id FROM (
            SELECT q.query_id, corpus.vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.query_id
                       ORDER BY {_COS_SQL.format(a="corpus.v", b="q.qv")} DESC, corpus.vec_id
                   ) AS rnk
            FROM corpus, q
        ) tb WHERE rnk <= 10
    ), hits AS (
        SELECT nprobe, COUNT(*) AS n_hits
        FROM ivf JOIN brute USING (query_id, vec_id)
        GROUP BY nprobe
    ), nq AS (
        SELECT COUNT(*) AS n_queries FROM q
    )
    SELECT nprobe, n_hits, n_queries,
           CAST(n_hits AS DOUBLE) / (10 * n_queries) AS recall_at_10
    FROM hits, nq
    """,
)
def similarity_ivf_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF recall@10 at nprobe in (1, 2, 4) against the exact
    brute-force top-10 — the accuracy/cost curve every ANN deployment
    must publish before anyone trusts its nprobe setting. Same
    deterministic seed centroids (vec_id < 8) as the oracled IVF
    queries; a hit is an (query, neighbor) pair present in both the
    IVF and the exact top-10 (rank tie-broken by vec_id on both
    engines, self-match included — deterministic and documented).
    recall_at_10 = n_hits / (10 · n_queries), an exact int division
    both engines round identically.

    Scale shape: ONE corpus assignment pass (broadcast centroids),
    `localCheckpoint`ed so the three nprobe levels physically REUSE
    it (without the checkpoint Catalyst re-derives the assignment per
    level — three corpus windows; the r9 review caught the docstring
    over-claiming what the plan did) — each level is then a filter +
    rank over the same checkpointed candidate join. The brute-force
    arm is the audit's honest cost and runs on the SAMPLED query set
    (every 100th vector), which is how a production recall audit
    bounds itself. Counts are exact bigints — the audit is
    hash-verified, not eyeballed."""
    from rs_query_engine_spark.operators.similarity import (
        _as_double,
        assign_centroids,
        brute_force_topk,
        dot,
        norm_sq,
    )

    e = _t(spark, sf_dir, "embeddings")
    cent = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("centroid_vec"),
    )
    # one corpus assignment pass, checkpointed: three topk levels +
    # consumers reuse the materialized rows (see docstring)
    assigned = assign_centroids(e, cent).transform(truncate_lineage)
    # probe ranks ≤ 4 for the query subset, keeping the rank as pr
    qc = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        _as_double(F.col("embedding")).alias("_qv"),
        F.sqrt(norm_sq(_as_double(F.col("embedding")))).alias("_qn"),
    )
    cc = cent.select(
        "centroid_id",
        _as_double(F.col("centroid_vec")).alias("_cv"),
        F.sqrt(norm_sq(_as_double(F.col("centroid_vec")))).alias("_cn"),
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_cc").desc(), F.col("centroid_id")
    )
    probes = (
        qc.crossJoin(F.broadcast(cc))
        .select(
            "query_id",
            "_qv",
            "_qn",
            "centroid_id",
            F.try_divide(
                dot(F.col("_qv"), F.col("_cv")), F.col("_qn") * F.col("_cn")
            ).alias("_cc"),
        )
        .withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= 4)
        .select("query_id", "_qv", "_qn", "centroid_id", "pr")
    )
    # checkpoint the scored candidate join too (r18): each of the three
    # nprobe levels re-derived cand — the probe-side corpus scan, the
    # broadcast join AND the 64-dim cosine per candidate — three times;
    # the cut computes it once and the levels rank stored (query_id,
    # vec_id, cos, pr) rows, keeping their WindowGroupLimit top-10
    # pushdown over a block read instead of a recompute
    cand = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .select(
            "query_id",
            "vec_id",
            F.try_divide(
                dot(F.col("_v"), F.col("_qv")), F.col("_n") * F.col("_qn")
            ).alias("cos"),
            "pr",
        )
        .transform(truncate_lineage)
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    levels = []
    for n in (1, 2, 4):
        levels.append(
            cand.filter(F.col("pr") <= n)
            .withColumn("rnk", F.row_number().over(wr))
            .filter(F.col("rnk") <= 10)
            .select(F.lit(n).alias("nprobe"), "query_id", "vec_id")
        )
    ivf_all = levels[0].unionByName(levels[1]).unionByName(levels[2])
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    brute = brute_force_topk(e, q, 10).select("query_id", "vec_id")
    hits = ivf_all.join(brute, ["query_id", "vec_id"]).groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    nq = q.agg(F.count(F.lit(1)).alias("n_queries"))
    return hits.crossJoin(F.broadcast(nq)).select(
        "nprobe",
        "n_hits",
        "n_queries",
        (F.col("n_hits").cast("double") / (10 * F.col("n_queries"))).alias(
            "recall_at_10"
        ),
    )


# =====================================================================
# TPC-H shape coverage: Q2 / Q13 / Q22 analogues (no partsupp/phone
# columns in this corpus — each keeps the plan topology that makes
# the dbgen query a benchmark: correlated-min, left-join histogram,
# scalar-subquery + anti-join)
# =====================================================================


@register_staged(
    "tpch_q2_shape",
    oracle="""
    WITH sup AS (
        SELECT s.s_suppkey, s.s_name, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ), base AS (
        SELECT p.p_partkey, p.p_name, sup.s_name, sup.n_name,
               l.l_extendedprice / l.l_quantity AS unit
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey AND p.p_size = 15
        JOIN sup   ON l.l_suppkey = sup.s_suppkey
    ), mn AS (
        SELECT p_partkey, MIN(unit) AS min_unit FROM base GROUP BY p_partkey
    )
    SELECT DISTINCT b.p_partkey, b.p_name, b.n_name, b.s_name, mn.min_unit
    FROM base b JOIN mn ON b.p_partkey = mn.p_partkey AND b.unit = mn.min_unit
    ORDER BY mn.min_unit, b.p_partkey, b.s_name
    LIMIT 100
    """,
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 SHAPE (dbgen Q2 finds the min-supplycost supplier per
    part in a region via a correlated subquery over partsupp; this
    corpus has no partsupp, so the same correlated-MIN topology runs
    on lineitem's observed unit price): for each size-15 part, the
    EUROPE suppliers that shipped it at the minimum unit price.

    Scale shape: the correlated MIN decorrelates into a per-part
    aggregate over the already-joined base — one groupBy on
    l_partkey — joined back on (partkey, unit = min) with both sides
    sharing the partkey shuffle key; nation/region broadcast; part
    and supplier carry NO hints (both SF-proportional — AQE sizes
    them; the size-15 filter is pushed to the part scan); the final
    top-100 is TakeOrderedAndProject. Unit price is a raw IEEE
    division — bit-identical in both engines; the min-equality join
    compares the identical double."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    sup = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "n_name")
    )
    base = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
        )
    )
    mn = base.groupBy("p_partkey").agg(F.min("unit").alias("min_unit"))
    return (
        base.join(mn, "p_partkey")
        .filter(F.col("unit") == F.col("min_unit"))
        .select("p_partkey", "p_name", "n_name", "s_name", "min_unit")
        .dropDuplicates()
        .orderBy("min_unit", "p_partkey", "s_name")
        .limit(100)
    )


@register_staged(
    "tpch_q13_shape",
    oracle="""
    WITH per_c AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_c GROUP BY c_count
    """,
)
def tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — customer order-count distribution: LEFT join
    customers to their non-urgent orders (the join-condition filter,
    NOT a WHERE — customers with zero qualifying orders must survive
    with c_count = 0), count per customer, then histogram the counts.

    Scale shape: the classic two-level aggregation — the first
    groupBy shuffles on c_custkey (the join's own key, so AQE can
    reuse the exchange), the second on the tiny c_count domain;
    COUNT(o_orderkey) counts non-null only, which is what makes the
    left join's null-extension become the zero bucket."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
    per_c = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_c.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register_staged(
    "tpch_q22_shape",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
               / COUNT(*) AS ab
        FROM customer
        WHERE c_nationkey BETWEEN 0 AND 6 AND c_acctbal > 0.0
    )
    SELECT c.c_nationkey AS cntrycode,
           COUNT(*) AS numcust,
           CAST(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
               AS totacctbal
    FROM customer c, avg_bal
    WHERE c.c_nationkey BETWEEN 0 AND 6
      AND c.c_acctbal > avg_bal.ab
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
            AND o.o_orderdate >= TIMESTAMP '1998-01-01'
      )
    GROUP BY c.c_nationkey
    """,
)
def tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 — global-sales-opportunity: customers in seven
    selected nations (dbgen keys on phone country codes; this corpus
    has no phone, so n_nationkey 0–6 is the code set) whose balance
    beats the average POSITIVE balance of that population and who
    have placed no recent urgent order, grouped per country. (dbgen's
    predicate is "no orders at all", but every customer in this
    corpus has orders — an always-empty result would prove nothing —
    so the anti-join correlates on the same key with extra pushed
    conditions, the structurally identical and non-degenerate form.)

    Scale shape: the scalar AVG subquery is a 1-row aggregate
    broadcast back over the filtered customer scan (the decorrelated
    form — never per-row); the "never ordered" probe is a LEFT ANTI
    join that shuffles only (custkey) pairs; the final rollup keys on
    the 7-value nation code. AVG is decimal-exact then one double
    division (oracle casts the decimal sum via VARCHAR — the >2^53
    direct-cast ULP gotcha); the balance comparison then compares
    bit-identical doubles."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_nationkey").between(0, 6))
    ab = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(D_PRICE)).cast("double")
                / F.count(F.lit(1))
            ).alias("ab")
        )
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= "1998-01-01")
        )
        .select("o_custkey")
    )
    sel = (
        c.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return sel.groupBy(F.col("c_nationkey").alias("cntrycode")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast(D_PRICE)).cast("double").alias("totacctbal"),
    )


# =====================================================================
# Wide pivot, deterministic split, rolling DAU, skew diagnostics,
# content-defined chunking
# =====================================================================

_LANGS = ("de", "en", "es", "fr", "zh")


@register_staged(
    "agg_pivot_wide",
    oracle=f"""
    SELECT source, {", ".join(_LANGS)},
           {" + ".join(_LANGS)} AS total
    FROM (
        SELECT source,
               {", ".join(f"COUNT(CASE WHEN lang = '{lng}' THEN 1 END) AS {lng}" for lng in _LANGS)}
        FROM documents GROUP BY source
    ) t
    """,
)
def agg_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT to wide form — per-source document counts with one
    column per language. The pivot values are EXPLICIT (the stable
    lang domain): Spark's values-less ``pivot()`` first runs a
    distinct scan to discover the columns — a whole extra corpus pass
    at 100 TB — and makes the output schema data-dependent, which
    breaks every downstream consumer the day a new lang appears.
    With explicit values the pivot is a single groupBy whose
    aggregation buffer is one slot per named value (map-side
    partials, group-cardinality shuffle). Missing combinations
    surface as NULL counts — coalesced to 0 to match SQL's
    COUNT(CASE...); the row total sums the named columns so both
    engines agree even if an unlisted lang existed."""
    d = _t(spark, sf_dir, "documents")
    wide = d.groupBy("source").pivot("lang", list(_LANGS)).count()
    cols = [
        F.coalesce(F.col(lng), F.lit(0).cast("bigint")).alias(lng) for lng in _LANGS
    ]
    wide = wide.select("source", *cols)
    total = None
    for lng in _LANGS:
        total = F.col(lng) if total is None else total + F.col(lng)
    return wide.withColumn("total", total)


@register_staged(
    "sample_split_train_val_test",
    oracle="""
    WITH b AS (
        SELECT doc_id, n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
                   AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM b GROUP BY 1
    """,
)
def sample_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split by content-hash
    bucket — the split every training pipeline needs to be
    REPRODUCIBLE and engine-portable: md5(doc_id) % 100 assigns each
    document to exactly one split (disjoint and exhaustive by
    construction), with no RNG state, no ordering dependence, and the
    same assignment on any engine or cluster size. The query audits
    the split: per-split doc and char counts, hash-verified against
    DuckDB computing the identical buckets.

    Scale shape: pure map + one 3-group aggregate — the split column
    would be the partition key of the materialized output, so the
    decision costs nothing at write time."""
    from rs_query_engine_spark.functions.hashing import md5_hex8

    d = _t(spark, sf_dir, "documents")
    bucket = md5_hex8(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@register_staged(
    "events_rolling_dau",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), days AS (
        SELECT DISTINCT day FROM ud
    )
    SELECT d.day,
           COUNT(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END) AS dau_1d,
           COUNT(DISTINCT u.user_id) AS dau_7d
    FROM days d JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    GROUP BY d.day
    """,
)
def events_rolling_dau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day — the engagement metric
    whose naive form (a sliding COUNT DISTINCT window) cannot be
    computed as a window function at all (count-distinct frames are
    unsupported) and whose self-join form pairs every day with a
    week of activity. Spark-first shape: the distinct (user, day)
    activity set EXPANDS map-side — each active day emits its 7
    target days via ``sequence``/``explode`` (a fixed ×7 fan-out,
    no join) — then one groupBy(day) computes both the 1-day and
    trailing-7-day distinct counts; the join against the observed-day
    list (≤ a few thousand rows for years of data) is broadcast.
    Early days keep their partial trailing windows — standard for the
    metric and identical on both engines."""
    ev = _t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    days = ud.select("day").distinct()
    expanded = ud.select(
        "user_id",
        F.col("day").alias("active_day"),
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias("day"),
    )
    target = expanded.join(F.broadcast(days), "day")
    return target.groupBy("day").agg(
        F.countDistinct(
            F.when(F.col("active_day") == F.col("day"), F.col("user_id"))
        ).alias("dau_1d"),
        F.countDistinct("user_id").alias("dau_7d"),
    )


@register_staged(
    "skew_key_diagnostics",
    oracle="""
    WITH cnts AS (
        SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
    ), tot AS (
        SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS n_keys FROM cnts
    )
    SELECT l_partkey, cnt,
           CAST(cnt AS DOUBLE) / total AS share,
           CAST(cnt * n_keys AS DOUBLE) / total AS skew_ratio
    FROM cnts, tot
    ORDER BY cnt DESC, l_partkey
    LIMIT 10
    """,
)
def skew_key_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics — the pre-flight check before any
    big shuffle at 100 TB (operators/skew.py is the cure; this is the
    diagnosis): the top-10 heaviest l_partkey values with their
    absolute count, share of all rows, and skew ratio (count ÷ mean
    count — how many average keys one hot key is worth). A ratio ≫ 1
    on a planned join key means salting or AQE skew-join handling
    before the job runs, not after it straggles.

    Scale shape: one map-side-combined groupBy on the key, a 1-row
    (total, n_keys) aggregate broadcast back, and a top-10 that plans
    as TakeOrderedAndProject — per-partition heaps, no global sort.
    Ratios are exact integer arithmetic until one final double
    division, identical in both engines."""
    li = _t(spark, sf_dir, "lineitem")
    cnts = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_keys")
    )
    return (
        cnts.crossJoin(F.broadcast(tot))
        .select(
            "l_partkey",
            "cnt",
            (F.col("cnt").cast("double") / F.col("total")).alias("share"),
            (
                (F.col("cnt") * F.col("n_keys")).cast("double") / F.col("total")
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(10)
    )


@register_staged(
    "text_cdc_chunks",
    oracle=r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(lower(text), '\s+') AS tok
        FROM documents
    ), b AS (
        SELECT doc_id, len(tok) AS n,
               list_filter(
                   generate_series(3, len(tok)),
                   i -> i < len(tok)
                        AND ('0x' || substr(md5(array_to_string(tok[i-2:i], ' ')), 1, 8))::BIGINT % 8 = 0
               ) AS bpos
        FROM t
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(len(bpos) + 1 AS BIGINT) AS n_chunks,
           CAST(list_max(
               list_transform(
                   generate_series(1, len(bpos) + 1),
                   k -> COALESCE(bpos[k], n) - COALESCE(bpos[k-1], 0)
               )
           ) AS BIGINT) AS max_chunk,
           CAST(n AS DOUBLE) / (len(bpos) + 1) AS avg_chunk
    FROM b
    """,
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (rolling-hash boundaries, the
    FastCDC/rsync idea at token granularity) — the chunking that
    makes chunk-level dedup robust to insertions: a fixed-size
    chunker shifts every boundary after an edit, while content-
    defined boundaries (cut after token i when the hash of the
    3-token window ending at i falls in 1/8 of hash space) realign
    immediately. Emits per-doc chunk statistics: token count, chunk
    count (expected ~8-token chunks), largest chunk, mean chunk size.

    Scale shape: ENTIRELY map-side — boundary positions, chunk
    lengths and their max all come from array higher-order functions
    over the token list (no explode, no shuffle, no UDF); at 100 TB
    this is a single pass that rides whatever partitioning the scan
    has. The boundary hash is the engine-portable md5 primitive, so
    every chunk edge is oracle-checkable; the trailing window guard
    (i < n) keeps the final chunk non-empty."""
    from rs_query_engine_spark.functions.text import cdc_chunk_stats
    from rs_query_engine_spark.sources.corpus import spread

    d = spread(_t(spark, sf_dir, "documents"))
    return cdc_chunk_stats(d, "doc_id", "text", mask=8)


@register_staged(
    "text_feature_hashing",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
        FROM documents
    )
    SELECT doc_id,
           ('0x' || substr(md5(tok), 1, 8))::BIGINT % 16 AS bucket,
           COUNT(*) AS cnt
    FROM tok GROUP BY doc_id, bucket
    """,
)
def text_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorizer (Weinberger et al.) — each document
    becomes a fixed-16-dimension sparse count vector by hashing
    tokens straight into buckets, in long form (doc_id, bucket, cnt).
    This is the vectorizer that actually works at 100 TB: unlike
    tf-idf/vocabulary encoders there is NO vocabulary table to build,
    maintain, or broadcast — the dimension is fixed before the first
    document arrives, new tokens never change the schema, and two
    engines (or two cluster runs years apart) agree bucket-for-bucket
    because the hash is the engine-portable md5 primitive.

    Scale shape: one explode + one groupBy(doc_id, bucket) with
    map-side partials; since every exploded token carries its own
    doc_id, the aggregation key is corpus-partitionable and the
    shuffle carries at most 16 rows per document."""
    from rs_query_engine_spark.functions.hashing import md5_hex8
    from rs_query_engine_spark.functions.text import tokens
    from rs_query_engine_spark.sources.corpus import spread

    d = spread(_t(spark, sf_dir, "documents"))
    toks = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
    return (
        toks.select("doc_id", (md5_hex8(F.col("tok")) % 16).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register_staged(
    "dedup_lsh_index_merge",
    oracle=f"""
    WITH {_LSH_IDX_CTES},
    bband AS (
        SELECT doc_id, band, key FROM banded
        WHERE doc_id % {BATCH_MOD} = {BATCH_REM}
    ), merged AS (
        SELECT doc_id, band, key FROM idx
        UNION ALL
        SELECT doc_id, band, key FROM bband
    )
    SELECT doc_id, band, key FROM merged
    QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= {MINHASH_MAX_BUCKET}
    """,
)
def dedup_lsh_index_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index MAINTENANCE — merge the screened batch into a new index
    generation (operators/lsh_index.py:ensure_merged_lsh_index),
    closing the incremental-ingest loop: build once, probe each batch,
    MERGE the batch in, repeat. LSM-style immutable generations: the
    union of the persisted postings and the batch-only pipeline is
    re-capped on MERGED bucket sizes and installed as a fresh
    atomic-rename artifact (the previous generation sweeps after
    install); corpus signatures are never recomputed. The oracle
    mirrors the two-stage cap exactly (existing-only cap, union,
    merged cap) so the write-once semantics — postings dropped by an
    earlier cap stay dropped, buckets that turn degenerate on merge
    retire wholesale — are hash-pinned, not just documented.

    Returns the READ-BACK merged postings: a hash-PASS proves the
    maintained artifact, not the in-memory union."""
    from rs_query_engine_spark.operators.lsh_index import (
        ensure_merged_lsh_index,
        read_index_bands,
    )

    root = ensure_merged_lsh_index(spark, sf_dir)
    return read_index_bands(spark, root)


# The streaming probe screens the SAME batch against the SAME index,
# one micro-batch at a time — per-document decisions are independent,
# so the union of all micro-batch outputs equals the one-shot batch
# probe and the two queries share one oracle by construction.
@register_staged("stream_index_probe", oracle=_ORACLE["dedup_incremental_indexed"])
def stream_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS-ingest dedup — the streaming face of the persisted
    LSH index: new documents arrive as a stream, each micro-batch is
    screened against the index inside ``foreachBatch`` (the arbitrary-
    batch-logic escape hatch: the probe is ordinary batch code — the
    same ``probe_index`` the batch query calls — so index probing,
    exactly-once parquet output and checkpoint-tracked offsets
    compose without a streaming-specific join implementation), and
    decisions land batch-id-partitioned for idempotent retries.

    Per-document decisions are independent of micro-batch boundaries,
    so the streamed output is hash-identical to the one-shot probe —
    THE invariant that makes continuous ingest trustworthy, pinned
    here against the same oracle as ``dedup_incremental_indexed``.
    At 100 TB this is the landing-zone listener: the index streams
    from the object store per micro-batch (or is cached executor-side
    between batches), and the checkpoint makes crash recovery replay
    only unconsumed files."""
    import hashlib as _hashlib
    import os
    import shutil
    import tempfile

    from rs_query_engine_spark.operators.lsh_index import (
        ensure_lsh_index,
        probe_index,
    )

    root = ensure_lsh_index(spark, sf_dir)
    src = os.path.join(os.path.abspath(sf_dir), "documents.parquet")
    # probe the batch schema — never hardcode (events.ts lesson)
    schema = spark.read.parquet(src).schema
    # the file-stream source tails a DIRECTORY (the production drop-
    # directory layout); the corpus ships one file, so expose it via
    # the same stable symlink shim read_events_stream uses
    if os.path.isfile(src):
        digest = _hashlib.md5(src.encode()).hexdigest()[:16]
        shim = os.path.join(tempfile.gettempdir(), f"rsqes_docstream_{digest}")
        os.makedirs(shim, exist_ok=True)
        link = os.path.join(shim, "documents.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
        stream_src = shim
    else:
        stream_src = src
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_src)
        .filter(F.col("doc_id") % BATCH_MOD == BATCH_REM)
    )
    # run_root keys on (src, pid): the pid component keeps two
    # concurrent invocations in different PROCESSES (pytest-xdist
    # running the value- and type-family parity tests in parallel)
    # from racing on one checkpoint/output dir (ADVICE r09); within a
    # process, re-invocations serialize on the blocking
    # processAllAvailable below, so reusing the pid dir is safe — and
    # the rmtree gives each invocation a fresh run (a reused
    # checkpoint would make the next run a no-op with stale files
    # alongside, the stream_parquet_sink pattern). Output VALUES are
    # dir-independent, so the batch-oracle hash identity is unaffected.
    digest = _hashlib.md5(src.encode()).hexdigest()[:16]
    run_root = os.path.join(
        tempfile.gettempdir(), f"rsqes_streamprobe_{digest}_{os.getpid()}"
    )
    out, ckpt = os.path.join(run_root, "out"), os.path.join(run_root, "ckpt")
    shutil.rmtree(run_root, ignore_errors=True)

    def screen(batch_df: DataFrame, batch_id: int) -> None:
        (
            probe_index(spark, root, batch_df, checkpoint=False)
            .withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_batch_id")
            .parquet(out)
        )

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(screen)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.read.parquet(out).select("doc_id", "n_matches", "admitted")


@register_staged(
    "dedup_lsh_index_stats",
    oracle=f"""
    WITH {_LSH_IDX_CTES},
    buckets AS (
        SELECT band, key, COUNT(*) AS sz FROM idx GROUP BY band, key
    )
    SELECT band,
           COUNT(*) AS n_buckets,
           CAST(SUM(sz) AS BIGINT) AS n_postings,
           COUNT(CASE WHEN sz = 1 THEN 1 END) AS singleton_buckets,
           COUNT(CASE WHEN sz >= 2 THEN 1 END) AS collision_buckets,
           MAX(sz) AS max_bucket,
           CAST(SUM(sz) AS DOUBLE) / COUNT(*) AS mean_bucket
    FROM buckets GROUP BY band
    """,
)
def dedup_lsh_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index HEALTH metrics — what an operator monitors on a
    maintained LSH index: per band, the bucket count, posting count,
    singleton/collision split, the largest bucket (headroom against
    the degeneracy cap) and the mean bucket size. Rising max_bucket
    means boilerplate keys drifting toward the cap (recall silently
    degrades when they cross it); a collapsing collision count means
    the banding no longer groups near-dups (wrong shingle size for
    the corpus). Reads ONLY the persisted artifact — auditing the
    index costs an index scan + a (band,key) aggregate, never a
    corpus pass; mean_bucket is one exact int division."""
    from rs_query_engine_spark.operators.lsh_index import (
        ensure_lsh_index,
        read_index_bands,
    )

    root = ensure_lsh_index(spark, sf_dir)
    buckets = (
        read_index_bands(spark, root)
        .groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    return buckets.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum("sz").alias("n_postings"),
        F.count(F.when(F.col("sz") == 1, 1)).alias("singleton_buckets"),
        F.count(F.when(F.col("sz") >= 2, 1)).alias("collision_buckets"),
        F.max("sz").alias("max_bucket"),
        (F.sum("sz").cast("double") / F.count(F.lit(1))).alias("mean_bucket"),
    )
