"""Staged query registrations for ROUND 17 — the round-16 holding pen.

EMPTY at creation (round-14 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r16_parity.py``, the
``STAGED_R16_ENABLED`` flag, and the ``_PEN_MODULES`` entry all
exist BEFORE the first round-16 query lands, so every registration
is verified-by-construction from its first commit), then SEEDED the
same round with 6 queries hash-verified at sf0.001 + sf0.01
(r13→r15 precedent): civil-time bucketing into an IANA zone with
the DST hour-count invariant, the positional-regexp builtin family
(count/substr/instr vs independent DuckDB emulations), the
bitemporal as-of read (versions × transaction-time cutoff — the
training-snapshot reproducibility primitive), multi-column
COUNT(DISTINCT) through the Expand rewrite, interval-union
dwell-time coverage (gaps-and-islands with a running-max end, exact
int64 microseconds), and largest-remainder sample-budget
apportionment (pure int64 Hamilton quotas summing to exactly K).
Round 15 fills the
rest (≤ ~15 queries — the rotation-backlog cap, see the BENCH_NOTES
ledger) while activating the r14 one; round 17 flips the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 15 (from round-14 loose ends — evaluate,
don't assume):

- **SQL + Python-compute surfaces remain CLOSED** (r13/r14/r15
  pens): recursive CTE, SQL UDF/table function/scripting, pipe
  syntax, LATERAL, Observation, GROUP BY ALL, named params,
  IDENTIFIER(), EXECUTE IMMEDIATE, listagg, collations, try_*; every
  Python tier incl. the full DataSource family (batch r/w, pushdown,
  Arrow, 3 stream readers, stream writer). Scan 4.1 release notes
  before assuming anything new.
- **Avro still BLOCKED** (no spark-avro in pip pyspark);
  ``transformWithStateInPandas`` still BLOCKED (hard google.protobuf
  import). Do not re-probe unless the image changes.
- **The bucketed-broadcast hybrid similarity join** stays shelved
  unless a plan audit finds a shuffle it would remove (r11–r14:
  none).
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
# justifying why SQL can't express it; the r16 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-16
    staged registry (merged live when STAGED_R16_ENABLED flips)."""

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
# Round-14 seeds (r13 precedent: the pen is created empty, then seeded
# the same round with a few verified queries under the ≤15 cap)
# ---------------------------------------------------------------------------


@register_staged(
    "events_timezone_bucketing",
    oracle="""
    WITH loc AS (
        SELECT event_type,
               timezone('America/New_York',
                        timezone('UTC', CAST(ts AS TIMESTAMP)))
                   AS local_ts,
               event_id, value
        FROM events
    )
    SELECT event_type,
           CAST(local_ts AS DATE) AS local_day,
           CAST(COUNT(event_id) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT EXTRACT(hour FROM local_ts)) AS BIGINT)
               AS n_local_hours,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
               AS total_value
    FROM loc GROUP BY event_type, CAST(local_ts AS DATE)
    """,
)
def events_timezone_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Civil-time bucketing — UTC event times rolled up into LOCAL
    days of an IANA zone (America/New_York): the reporting grain every
    product dashboard actually wants, and a cross-engine minefield
    because both engines must agree on the zone database and the DST
    transition rules (Spark ``from_utc_timestamp`` vs DuckDB's
    two-step ``timezone()`` — probed on the 2024 spring-forward and
    fall-back boundaries before this query existed). n_local_hours
    pins the giveaway invariant: a DST-transition local day has 23 or
    25 distinct hours, not 24.

    Scale shape: the zone conversion is a map-side scalar; the rollup
    is one partial+final hash aggregate on (type, local_day) — civil
    time costs nothing at 100 TB IF it stays an expression (the
    anti-pattern is a per-row Python tz lookup)."""
    loc = _t(spark, sf_dir, "events").select(
        "event_type",
        F.from_utc_timestamp(
            F.col("ts").cast("timestamp"), "America/New_York"
        ).alias("local_ts"),
        "event_id",
        "value",
    )
    return loc.groupBy(
        "event_type", F.to_date("local_ts").alias("local_day")
    ).agg(
        F.count("event_id").alias("n_events"),
        F.count_distinct(F.hour("local_ts")).alias("n_local_hours"),
        F.sum(F.col("value").cast(D_PRICE))
        .cast("double")
        .alias("total_value"),
    )


_REGEXP_RUN = "[aeiou]{2,}"  # shared pattern: runs of 2+ vowels


@register_staged(
    "string_regexp_family",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_REGEXP_RUN}'))
                AS BIGINT) AS n_runs,
           NULLIF(regexp_extract(text, '{_REGEXP_RUN}'), '')
               AS first_run,
           CAST(CASE WHEN regexp_matches(text, '{_REGEXP_RUN}')
                THEN length(string_split_regex(
                         text, '{_REGEXP_RUN}')[1]) + 1
                ELSE 0 END AS BIGINT) AS first_pos
    FROM documents
    """,
)
def string_regexp_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The positional-regexp builtin family — ``regexp_count`` /
    ``regexp_substr`` / ``regexp_instr`` (the Oracle/Snowflake trio
    Spark added in 3.5, the bread and butter of crawl-cleanup rules) —
    pinned against DuckDB emulations built from different primitives
    (extract_all length, NULLIF'd extract, prefix-split length), so
    agreement means both engines place the same leftmost match with
    the same greediness on the same non-trivial pattern. The no-match
    conventions are part of the pin: substr → NULL (DuckDB's '' is
    NULLIF'd to match), instr → 0.

    Scale shape: map-side scalar projection over a (doc_id, text)
    scan — regex cost is per-row CPU inside codegen, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_REGEXP_RUN))
        .cast("bigint")
        .alias("n_runs"),
        F.regexp_substr(F.col("text"), F.lit(_REGEXP_RUN)).alias(
            "first_run"
        ),
        F.regexp_instr(F.col("text"), F.lit(_REGEXP_RUN))
        .cast("bigint")
        .alias("first_pos"),
    )


# Bitemporal constants — every 17th event receives a correction
# (+1000.0 to value) whose TRANSACTION time lags its event time by one
# day; the as-of cutoff is two days before the corpus's newest event.
_BT_CORR_MOD = 17
_BT_LAG_US = 86_400_000_000
_BT_CUT_US = 2 * 86_400_000_000


@register_staged(
    "events_bitemporal_asof",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us, value
        FROM events WHERE event_id % {_BT_CORR_MOD} = 0
    ),
    vers AS (
        SELECT event_id, us AS txn_us, value FROM ev
        UNION ALL
        SELECT event_id, us + {_BT_LAG_US} AS txn_us,
               value + 1000.0 AS value
        FROM ev
    ),
    cut AS (
        SELECT MAX(epoch_us(CAST(ts AS TIMESTAMP))) - {_BT_CUT_US}
            AS t_cut
        FROM events
    ),
    vis AS (
        SELECT event_id, txn_us, value FROM vers, cut
        WHERE txn_us <= t_cut
    ),
    latest AS (
        SELECT event_id,
               CAST(COUNT(*) AS BIGINT) AS n_versions_visible,
               CAST(MAX(txn_us) AS BIGINT) AS visible_txn_us
        FROM vis GROUP BY event_id
    )
    SELECT l.event_id, l.n_versions_visible, l.visible_txn_us,
           v.value AS visible_value
    FROM latest l JOIN vis v
      ON l.event_id = v.event_id AND l.visible_txn_us = v.txn_us
    """,
)
def events_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BITEMPORAL as-of reads — "the data as we KNEW it at time T",
    the reproducibility primitive for training snapshots and audited
    reports: each corrected event carries two versions (original at
    txn=event time, correction landing one day later), and the as-of
    query sees, per event, exactly the versions whose TRANSACTION time
    had passed by the cutoff — recent events are invisible entirely,
    recently-corrected ones surface their ORIGINAL value (the
    correction hasn't landed yet), older ones the corrected value.
    Version choice is a join back on (event_id, max txn time) — the
    txn time is unique per event, and the join-back form is chosen
    over max_by/arg_max deliberately: the engines DISAGREE on
    NULL-argument argmax (DuckDB's arg_max skips NULL args, Spark's
    max_by returns them), so an equality join is the NULL-proof
    spelling for any corpus. The +1000.0 correction is a single IEEE
    add, hash-stable raw.

    Scale shape: versions build from one pruned scan + union; the
    cutoff is a 1-row broadcast; the as-of collapse is one key-grain
    partial+final aggregate plus one self-equi-join on the unique
    (event, txn) key — the same plan a Delta/Iceberg time-travel
    read would execute, spelled out on plain columns."""
    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_id") % _BT_CORR_MOD == 0)
        .select(
            "event_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "value",
        )
    )
    base = ev.select(
        "event_id", F.col("us").alias("txn_us"), "value"
    )
    corr = ev.select(
        "event_id",
        (F.col("us") + F.lit(_BT_LAG_US)).alias("txn_us"),
        (F.col("value") + F.lit(1000.0)).alias("value"),
    )
    vers = base.unionByName(corr)
    cut = _t(spark, sf_dir, "events").agg(
        (
            F.max(F.unix_micros(F.col("ts").cast("timestamp")))
            - F.lit(_BT_CUT_US)
        ).alias("t_cut")
    )
    vis = vers.crossJoin(F.broadcast(cut)).filter(
        F.col("txn_us") <= F.col("t_cut")
    )
    latest = vis.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_versions_visible"),
        F.max("txn_us").alias("visible_txn_us"),
    )
    return latest.join(
        vis.select(
            F.col("event_id").alias("v_event_id"),
            "txn_us",
            F.col("value").alias("visible_value"),
        ),
        (F.col("event_id") == F.col("v_event_id"))
        & (F.col("visible_txn_us") == F.col("txn_us")),
    ).select(
        "event_id", "n_versions_visible", "visible_txn_us",
        "visible_value",
    )


@register_staged(
    "agg_multi_distinct",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           CAST(COUNT(DISTINCT EXTRACT(year FROM o_orderdate))
                AS BIGINT) AS n_years,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
               AS total_price
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE distinct aggregates over different columns in one
    GROUP BY — the shape Catalyst must rewrite through an Expand node
    (each input row fans out once per distinct column, null-padded,
    then two aggregate passes dedupe and combine), because a hash agg
    can track at most one distinct set per key. Pinned because the
    rewrite is where multi-distinct queries silently go quadratic on
    engines without it, and because mixing distinct and plain
    aggregates (the SUM rides along) exercises the null-gid branch of
    the rewrite.

    Scale shape: Expand multiplies shuffle rows by the number of
    distinct columns (2 here) — the known, bounded cost — but both
    aggregate passes keep map-side partials; nothing is quadratic."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count_distinct(F.col("o_custkey")).alias("n_customers"),
        F.count_distinct(F.year("o_orderdate")).alias("n_years"),
        F.sum(F.col("o_totalprice").cast(D_PRICE))
        .cast("double")
        .alias("total_price"),
    )


_COV_WINDOW_US = 1_800_000_000  # each event covers [ts, ts + 30 min)


@register_staged(
    "events_interval_coverage",
    oracle=f"""
    WITH w AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS s,
               epoch_us(CAST(ts AS TIMESTAMP)) + {_COV_WINDOW_US} AS e
        FROM events
    ),
    flagged AS (
        SELECT user_id, s, e,
               CASE WHEN s <= COALESCE(MAX(e) OVER (
                        PARTITION BY user_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING), -1)
                    THEN 0 ELSE 1 END AS new_island
        FROM w
    ),
    islands AS (
        SELECT user_id, s, e,
               SUM(new_island) OVER (PARTITION BY user_id ORDER BY s
                                     ROWS UNBOUNDED PRECEDING)
                   AS island_id
        FROM flagged
    ),
    merged AS (
        SELECT user_id, island_id,
               MIN(s) AS island_start, MAX(e) AS island_end
        FROM islands GROUP BY user_id, island_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(island_end - island_start) AS BIGINT)
               AS coverage_us
    FROM merged GROUP BY user_id
    """,
)
def events_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-UNION coverage — per user, the total distinct time
    covered by overlapping activity windows ([ts, ts+30 min) per
    event): the dwell-time/uptime primitive naive SUM(window) gets
    wrong whenever sessions overlap (it double-counts). Classic
    gaps-and-islands: a window starts a new island iff it begins
    after the running MAX of all previous ends (the running max, not
    the previous end — an early long window can swallow several later
    short ones), islands merge by running-sum id, and coverage is the
    exact int64-microsecond sum of island extents. Row ties on
    (user, ts) are harmless by construction: equal starts imply equal
    ends, so the island decision is order-free.

    Scale shape: ONE key-partitioned sort powers both window passes
    (same spec), then two partial-agg reduces at island and user
    grain — the corpus is sorted once, never paired."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
    )
    w = ev.select(
        "user_id", "s", (F.col("s") + F.lit(_COV_WINDOW_US)).alias("e")
    )
    wo = Window.partitionBy("user_id").orderBy("s")
    prev_max_e = F.max("e").over(
        wo.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = w.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s") <= F.coalesce(prev_max_e, F.lit(-1)), F.lit(0)
        )
        .otherwise(F.lit(1))
        .alias("new_island"),
    )
    islands = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("new_island")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island_id"),
    )
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("s").alias("island_start"),
        F.max("e").alias("island_end"),
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("island_end") - F.col("island_start")).alias(
            "coverage_us"
        ),
    )


_ALLOC_K = 1000  # total sample budget to apportion across sources


@register_staged(
    "sample_proportional_allocation",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n_docs) AS n_total FROM counts),
    quota AS (
        SELECT source, n_docs,
               ({_ALLOC_K} * n_docs) // n_total AS base,
               ({_ALLOC_K} * n_docs) % n_total AS rem
        FROM counts, tot
    ),
    ranked AS (
        SELECT *,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
               SUM(base) OVER () AS base_sum
        FROM quota
    )
    SELECT source, n_docs,
           CAST(base + CASE WHEN rk <= {_ALLOC_K} - base_sum
                            THEN 1 ELSE 0 END AS BIGINT) AS alloc
    FROM ranked
    """,
)
def sample_proportional_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment — the exact answer
    to "split a sample budget of K across sources proportionally, in
    INTEGERS, summing to exactly K": floor quotas from integer
    division, then +1 to the sources with the largest remainders
    until the budget is spent. Every step is int64 arithmetic
    (quotient, modulus, rank — no float quota anywhere), ties on the
    remainder break by source name, and Σalloc = K holds by
    construction on both engines — the allocation that naive
    round(K·share) gets wrong whenever rounding errors accumulate
    (it can over- or under-spend the budget by several samples).
    Feeds the per-group fixed-size samplers (`sample_fixed_per_group`
    takes the per-source targets this query computes).

    Scale shape: the corpus collapses to per-source counts in one
    partial+final aggregate; everything after runs on a
    |sources|-row frame (a broadcast 1-row total, one window rank) —
    apportionment is free at any corpus size."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n_total"))
    quota = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.expr(f"({_ALLOC_K} * n_docs) DIV n_total").alias("base"),
        ((F.lit(_ALLOC_K) * F.col("n_docs")) % F.col("n_total")).alias(
            "rem"
        ),
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("source"))
    wall = Window.partitionBy()
    ranked = quota.select(
        "source",
        "n_docs",
        "base",
        F.row_number().over(w).alias("rk"),
        F.sum("base").over(wall).alias("base_sum"),
    )
    return ranked.select(
        "source",
        "n_docs",
        (
            F.col("base")
            + F.when(
                F.col("rk") <= F.lit(_ALLOC_K) - F.col("base_sum"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("alloc"),
    )
