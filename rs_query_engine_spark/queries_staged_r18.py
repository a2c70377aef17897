"""Staged query registrations for ROUND 19 — the round-18 holding pen.

EMPTY at creation (round-15 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r18_parity.py``, the
``STAGED_R18_ENABLED`` flag, and the ``_PEN_MODULES`` entry all exist
BEFORE the first round-18 registration, so every query is
verified-by-construction from its first commit), then seeded the
same round with 3 queries hash-verified at sf0.001 + sf0.01:
PERCENT-OF-PARENT hierarchy shares (exact DECIMAL window sums over
the leaf frame, the drill-down companion to agg_rollup_returnflag),
the HIGHER-ORDER map-operator pipeline (map_filter →
transform_values → map_entries-explode pinned against the
relational GROUP BY/HAVING spelling — the transformation tier of
the MAP surface whose build/lookup tier is map_functions), and the
ANTI-ENTROPY checksum DIFF (per-bucket SUM+BIT_XOR digests of two
deterministically-derived table generations, differing buckets
only — the repair-scoping companion to maintenance_table_checksum,
computed in one conditional-aggregate pass). Rounds
16-18 fill the rest (≤ ~15 queries — the rotation-backlog cap, see
the BENCH_NOTES ledger); round 19 flips the flag. Flip cadence for context: round 16
flips the r15 pen, round 17 flips the r16 pen, round 18 flips the
r17 pen (closed at 15 in round 15), round 19 flips this one.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle; DuckDB decimal→double casts go
through the VARCHAR hop.

Candidate leads (round-15 loose ends — evaluate, don't assume):

- **SQL + Python-compute surfaces remain CLOSED** (r13-r17 pens):
  recursive CTE, SQL UDF/table function/scripting, pipe syntax,
  LATERAL, Observation, GROUP BY ALL, named params, IDENTIFIER(),
  EXECUTE IMMEDIATE, listagg, collations, try_*, positional regexp,
  multi-distinct Expand, ``_metadata``, GROUPING SETS + ROLLUP +
  CUBE + PIVOT, the Spark-4.1 TIME type, VARIANT, every Python tier
  incl. the full DataSource family with filter pushdown. Scan the
  installed 4.1.x surface once per round before assuming anything
  new (the round-15 scan note lives in the r17 pen header).
- **Avro still BLOCKED** (no spark-avro in pip pyspark);
  ``transformWithStateInPandas`` still BLOCKED (hard google.protobuf
  import). Do not re-probe unless the image changes.
- **Probed and REJECTED at round 15** (don't re-evaluate without new
  facts): theta/hll sketch aggs (approx-only — would grow the
  rows-only set held at three by design), uniform/randstr
  (partition-order-dependent), pairwise source vocabulary-Jaccard
  (trivial pin on this corpus), phonetic joins (DuckDB 1.0 has no
  soundex), moving median over row frames (interpolation roulette).
- The rows-only trio (``similarity_ivf_kmeans``,
  ``agg_approx_percentile``, ``text_unigram_logprob``) stays
  rows-only by design with invariant companions — re-evaluate only
  if one becomes exactly oracle-able.
- Unexplored-but-plausible families for seeds: MAP-typed column
  operators (map_from_entries / map_filter / transform_values with
  an explode-to-rows boundary — MAP cells can't reach the driver
  hash), sequence()-generated calendar/grid frames beyond gap_fill,
  sessionized funnel steps with per-step conversion decay, exact
  reservoir-free stratified minima (min_by per stratum matrix),
  anti-entropy checksum DIFF of two table generations (pairs with
  maintenance_table_checksum), percent-of-parent ratios down a
  rollup hierarchy (pairs with agg_rollup_returnflag).
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r18 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-18
    staged registry (merged live when STAGED_R18_ENABLED flips)."""

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


from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rs_query_engine_spark.queries import D_PRICE, _t  # noqa: E402

# ---------------------------------------------------------------------------
# Round-15 seeds (r13-r17 precedent: the pen is created at round end
# and seeded the same round with verified queries)
# ---------------------------------------------------------------------------


@register_staged(
    "agg_pct_of_parent_hierarchy",
    oracle="""
    WITH leaf AS (
        SELECT l_returnflag, l_linestatus,
               CAST(COUNT(*) AS BIGINT) AS n,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qsum
        FROM lineitem GROUP BY 1, 2
    )
    SELECT l_returnflag, l_linestatus, n,
           CAST(CAST(qsum AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(qsum AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(qsum) OVER (PARTITION BY l_returnflag)
                           AS VARCHAR) AS DOUBLE) AS pct_of_parent,
           CAST(CAST(qsum AS VARCHAR) AS DOUBLE)
               / CAST(CAST(SUM(qsum) OVER () AS VARCHAR) AS DOUBLE)
               AS pct_of_total
    FROM leaf
    """,
)
def agg_pct_of_parent_hierarchy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERCENT-OF-PARENT down a grouping hierarchy — each
    (flag, status) leaf's share of its flag subtotal and of the
    grand total: the drill-down ratio every BI hierarchy renders
    next to agg_rollup_returnflag's absolute subtotals (the round-15
    leads-ledger pairing). The parent masses are DECIMAL window sums
    over the LEAF frame — exact, so each share is one
    double ÷ double with both operands leaving exactness at the
    documented boundary (VARCHAR hop on the DuckDB side); no float
    ever re-aggregates. The unpartitioned total window runs on the
    ≤|flags|·|statuses|-row aggregated frame, never the corpus (the
    quality_pareto_frontier discipline).

    Scale shape: ONE partial+final corpus aggregate; both hierarchy
    windows share the tiny leaf frame (the flag-keyed one and the
    global one are O(leaf-count)); no join, no Expand, one corpus
    scan."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast(D_PRICE).alias("q"),
    )
    leaf = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), F.sum("q").alias("qsum")
    )
    wf = Window.partitionBy("l_returnflag")
    wall = Window.partitionBy()
    leaf_d = F.col("qsum").cast("double")
    return leaf.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        leaf_d.alias("sum_qty"),
        (leaf_d / F.sum("qsum").over(wf).cast("double")).alias(
            "pct_of_parent"
        ),
        (leaf_d / F.sum("qsum").over(wall).cast("double")).alias(
            "pct_of_total"
        ),
    )


@register_staged(
    "text_token_map_pipeline",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(lower(text),
                                            '[ \t\n\r\f]+')) AS token
        FROM documents
    ),
    per AS (
        SELECT doc_id, token, COUNT(*) AS c
        FROM tok WHERE token <> '' GROUP BY 1, 2
    )
    SELECT doc_id, token, CAST(c * c AS BIGINT) AS boost
    FROM per WHERE c >= 2
    """,
)
def text_token_map_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGHER-ORDER map operators — the transformation tier of the
    MAP column surface (building + lookup landed as
    ``map_functions``; this pins ``map_filter`` →
    ``transform_values`` → ``map_entries``-explode against the
    relational spelling): per-document token→count feature bags
    filtered to repeated tokens (count ≥ 2) and re-weighted (count²,
    the classic tf² boost), then exploded back to rows. The map is
    deterministic despite collect_list's nondeterministic order
    because keys are unique by construction (pre-grouped on
    (doc, token) — the map_functions precedent), and the lambda
    pipeline must produce exactly the GROUP BY ... HAVING multiset
    the oracle computes. Tokenization uses the explicit class
    ``[ \\t\\n\\r\\f]+`` in BOTH engines (ADVICE r15: Java's ``\\s``
    includes U+000B vertical tab, RE2's does not — the explicit
    class makes the tokenizers provably identical instead of
    relying on the corpus containing no unusual whitespace); empty
    edge tokens dropped on both engines.

    Scale shape: one (doc, token)-keyed partial+final aggregate,
    one (doc)-keyed map rollup, then map-cell lambdas (JVM-side,
    whole-stage-codegen — no Python) and a map-only explode; no
    join; map cells never reach the driver (exploded to scalar rows
    at the boundary)."""
    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.explode(
                F.split(F.lower("text"), r"[ \t\n\r\f]+")
            ).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    per = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
    m = per.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("t", "c"))).alias("m")
    )
    m2 = m.select(
        "doc_id",
        F.transform_values(
            F.map_filter("m", lambda k, v: v >= 2), lambda k, v: v * v
        ).alias("m2"),
    )
    return (
        m2.select("doc_id", F.explode(F.map_entries("m2")).alias("e"))
        .select(
            "doc_id",
            F.col("e.key").alias("token"),
            F.col("e.value").cast("bigint").alias("boost"),
        )
    )


@register_staged(
    "maintenance_checksum_diff",
    oracle="""
    WITH h AS (
        SELECT o_orderkey % 64 AS bucket,
               ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|'
                                   || CAST(o_custkey AS VARCHAR) || '|'
                                   || o_orderstatus), 1, 8))::BIGINT
                   AS rh1,
               CASE WHEN o_orderkey % 97 = 0 THEN NULL
                    ELSE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                              || '|' || CAST(o_custkey AS VARCHAR) || '|'
                              || CASE WHEN o_orderkey % 101 = 0 THEN 'X'
                                      ELSE o_orderstatus END
                          ), 1, 8))::BIGINT
               END AS rh2
        FROM orders
    ),
    b AS (
        SELECT bucket,
               CAST(COUNT(rh1) AS BIGINT) AS n_v1,
               CAST(COUNT(rh2) AS BIGINT) AS n_v2,
               CAST(SUM(rh1) AS BIGINT) AS s1,
               CAST(COALESCE(SUM(rh2), 0) AS BIGINT) AS s2,
               CAST(bit_xor(rh1) AS BIGINT) AS x1,
               CAST(COALESCE(bit_xor(rh2), 0) AS BIGINT) AS x2
        FROM h GROUP BY bucket
    )
    SELECT bucket, n_v1, n_v2,
           (s1 = s2) AS sum_match, (x1 = x2) AS xor_match
    FROM b
    WHERE NOT (n_v1 = n_v2 AND s1 = s2 AND x1 = x2)
    """,
)
def maintenance_checksum_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANTI-ENTROPY checksum DIFF of two table generations — WHICH
    buckets of a replica diverged, the repair-scoping step that
    follows maintenance_table_checksum's whole-table verdict (the
    Merkle-less Cassandra/Dynamo repair primitive: compare per-bucket
    digests, re-sync only differing buckets). Generation v2 is v1
    under a deterministic key-driven mutation (keys ≡0 mod 97
    deleted, keys ≡0 mod 101 status-rewritten), so both engines
    derive identical generations with no fixture write. Per bucket
    (key mod 64): exact row counts and the order-independent
    SUM + BIT_XOR digests of each generation (the
    maintenance_table_checksum fold — int64-exact, never a double),
    emitting ONLY the buckets where any digest disagrees. Both
    generations' digests come from ONE conditional-aggregate pass
    (rh2 is NULL for deleted rows — both engines' SUM/BIT_XOR skip
    NULLs, probed by the parity gate); against two PHYSICAL replicas
    the same plan is two map-side folds + a |buckets|-row equi-join
    — never a row-level join.

    Scale shape: map-side md5 + fold, ONE partial+final aggregate
    onto the 64-bucket domain, a tiny post-filter; no join, no sort,
    one corpus scan."""
    o = _t(spark, sf_dir, "orders")

    def rh(status_col):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        status_col,
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")

    h = o.select(
        (F.col("o_orderkey") % 64).alias("bucket"),
        rh(F.col("o_orderstatus")).alias("rh1"),
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None)).otherwise(
            rh(
                F.when(F.col("o_orderkey") % 101 == 0, F.lit("X")).otherwise(
                    F.col("o_orderstatus")
                )
            )
        ).alias("rh2"),
    )
    b = h.groupBy("bucket").agg(
        F.count("rh1").alias("n_v1"),
        F.count("rh2").alias("n_v2"),
        F.sum("rh1").alias("s1"),
        F.coalesce(F.sum("rh2"), F.lit(0)).alias("s2"),
        F.expr("bit_xor(rh1)").alias("x1"),
        F.coalesce(F.expr("bit_xor(rh2)"), F.lit(0)).alias("x2"),
    )
    return b.filter(
        ~(
            (F.col("n_v1") == F.col("n_v2"))
            & (F.col("s1") == F.col("s2"))
            & (F.col("x1") == F.col("x2"))
        )
    ).select(
        "bucket",
        "n_v1",
        "n_v2",
        (F.col("s1") == F.col("s2")).alias("sum_match"),
        (F.col("x1") == F.col("x2")).alias("xor_match"),
    )
