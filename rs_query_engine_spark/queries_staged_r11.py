"""Staged query registrations for ROUND 12 — the round-11 holding pen.

EMPTY at round-10 end by design: the activation gate
(``tests/oracle/test_staged_r11_parity.py`` + ``STAGED_R11_ENABLED``
in ``queries.py``) is created BEFORE the first round-11 query lands
(ADVICE r07 precedent), so every registration here is
verified-by-construction from its first commit. Round 11 fills this
pen while activating the r10 one; round 12 flips the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 11 (from round-10 loose ends — evaluate,
don't assume):

- Streaming dedup horizon-expiry: DO NOT attempt a corpus-scale
  exact oracle — when a key has several rows in one micro-batch,
  which row's timestamp lands in state is partition-order-dependent,
  and every later expiry epoch inherits that nondeterminism (r10
  finding). The synthetic pin
  (tests/unit/test_streaming_dedup_expiry.py — no TTL extension by
  duplicates, one-batch eviction lag, two-batch late-filter lag) is
  the final form. (The stream-STREAM siblings — inner, left-outer,
  and the chained join-into-agg pipeline with its measured 24 h
  watermark propagation — landed in the r10 pen.)
- transformWithStateInPandas timer-driven TTL operator (the 4.1
  arbitrary-state API with event-time timers — the one stateful
  surface still untested under out-of-order arrival).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r11 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-11
    staged registry (merged live when STAGED_R11_ENABLED flips)."""

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
# Timer-driven TTL flush (applyInPandasWithState + EventTimeTimeout)
# ---------------------------------------------------------------------------


@register_staged(
    "stream_ttl_flush_ledger",
    oracle="""
    WITH e AS (
        SELECT CAST(ts AS TIMESTAMP) AS ts, user_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        FROM events
    ),
    m AS (SELECT MAX(ts) AS mx FROM e),
    t0 AS (SELECT e.* FROM e, m
           WHERE ts > mx - INTERVAL 5 DAY AND ts <= mx - INTERVAL 3 DAY),
    w1 AS (SELECT date_trunc('milliseconds', MAX(ts))
                  - INTERVAL 84 HOUR AS w FROM t0),
    w4 AS (SELECT date_trunc('milliseconds', MAX(ts))
                  - INTERVAL 84 HOUR AS w FROM e),
    admitted AS (
        SELECT e.* FROM e, m, w1
        WHERE ts > m.mx - INTERVAL 5 DAY OR ts > w1.w
    ),
    keys AS (
        SELECT user_id,
               CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n_events,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               MAX(ts) AS last_ts
        FROM admitted GROUP BY 1, 2
    )
    SELECT user_id, day, n_events, total_cents, last_ts
    FROM keys, w4
    WHERE last_ts + INTERVAL 12 HOUR < w4.w
    """,
)
def stream_ttl_flush_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timer-driven event-time-TTL flush under real out-of-order
    arrival — the arbitrary-state expiry operator
    (``streaming/stateful.py:ttl_flush_stream``,
    ``GroupStateTimeout.EventTimeTimeout``): per (user, day),
    accumulate count / exact cents / max event time across the 4-batch
    late feed; once the watermark passes a key's last event time + 12 h
    the key times out and emits ONE finalized flush record. Keys whose
    TTL has not elapsed when the stream drains are withheld — exactly
    the contract of a production inactivity flush (session close,
    abandoned-cart) where still-live keys must not leak partial rows.

    The oracle replays the measured semantics in SQL (probed on this
    Spark, pinned in tests/unit/test_streaming_ttl_flush.py):

    - ROW-level late filter with the two-batch lag: the late batch
      (batch 2) is filtered against the watermark from batch 0's data
      (W1); older rows are gone even though their (user, day) key is
      live — note the contrast with the built-in windowed agg
      (stream_late_data_drop), which admits by WINDOW end, not row ts.
    - STRICT timeout: a key fires in the first batch whose eviction
      watermark (data through N-1, trailing no-data batch included)
      exceeds its timer; equality does not fire (measured).
    - The below-watermark clamp (setTimeoutTimestamp rejects t <= wm)
      never changes WHICH keys flush by stream end, so membership
      reduces to: last admitted ts + TTL < final watermark W4 — which
      is what the oracle states.

    The feed straddles every interesting boundary at both test SFs:
    ~50/500 late rows are admitted into live keys, ~1/3 of keys flush,
    2/3 are withheld. 100-TB shape: state bounded by live keys, timer
    index does the eviction (no key-scan per batch), integer-cents
    accumulation keeps the Python stage partition-order-exact."""
    from rs_query_engine_spark.streaming.events import (
        LATE_DELAY,
        ensure_late_feed,
        run_stream_to_memory,
    )
    from rs_query_engine_spark.streaming.stateful import ttl_flush_stream

    feed = ensure_late_feed(spark, sf_dir)
    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    keyed = (
        stream.withWatermark("ts", LATE_DELAY)
        .withColumn("day", F.date_trunc("day", F.col("ts")))
        .withColumn(
            "cents", (F.col("value").cast("decimal(12,2)") * 100).cast("long")
        )
    )
    out = ttl_flush_stream(
        keyed,
        ["user_id", "day"],
        "user_id BIGINT, day TIMESTAMP, n_events BIGINT, "
        "total_cents BIGINT, last_ts TIMESTAMP",
        ttl_ms=12 * 3600 * 1000,
    )
    return run_stream_to_memory(
        out, "stream_ttl_flush_ledger", output_mode="update"
    )
