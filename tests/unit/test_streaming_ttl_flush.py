"""Pin the measured ``EventTimeTimeout`` semantics that
``streaming/stateful.py:ttl_flush_stream`` and the
``stream_ttl_flush_ledger`` oracle are built on (probed on Spark
4.1.2; every rule here was observed, not assumed):

1. Timed-out keys are delivered in the first batch whose EVICTION
   watermark (data through batch N-1, trailing no-data batch
   included) STRICTLY exceeds their timer — equality does not fire.
2. The late-input filter is ROW-level and lags two batches (the
   filter for batch N uses the watermark from data through N-2) —
   a late row for a LIVE key is still dropped, unlike the built-in
   windowed agg where admission is by window end.
3. ``setTimeoutTimestamp`` rejects values at or below the current
   watermark, so the operator clamps to watermark+1ms; a clamped key
   still flushes once the watermark advances — clamping changes WHEN,
   never WHETHER (for keys whose raw timer is below the final
   watermark).
4. The operator emits flush records ONLY — nothing is echoed on
   input batches, so its output is a set of finalized facts and is
   insensitive to batch-0 sink-delivery quirks (fires are impossible
   in batch 0, where the watermark is still unset).

A Spark version that fires non-strictly, filters with a different
lag, or stops running the trailing no-data batch must fail here
loudly before it silently breaks the pen oracle.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from rs_query_engine_spark.streaming.stateful import ttl_flush_stream

SCHEMA = "user_id bigint, ts timestamp, value double"
B = datetime(2026, 1, 1, 0, 0, 0)


def _t(minutes: float) -> datetime:
    return B + timedelta(minutes=minutes)


def _run(spark, name: str, files: list[list[tuple]], ttl_min: int = 15):
    """Drive the TTL-flush operator over a synthetic one-file-per-batch
    feed (10-minute watermark delay) and return the flushed rows."""
    root = os.path.join(
        tempfile.gettempdir(), f"rsqes_test_ttlflush_{name}_{os.getpid()}"
    )
    shutil.rmtree(root, ignore_errors=True)
    feed = os.path.join(root, "feed")
    os.makedirs(feed)
    for i, rows in enumerate(files):
        df = spark.createDataFrame(rows, SCHEMA)
        staging = os.path.join(root, f"_f{i}")
        df.coalesce(1).write.parquet(staging)
        part = [p for p in os.listdir(staging) if p.endswith(".parquet")][0]
        dst = os.path.join(feed, f"f{i}.parquet")
        os.rename(os.path.join(staging, part), dst)
        mt = 1_700_000_000 + i * 10
        os.utime(dst, (mt, mt))
        shutil.rmtree(staging)
    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    keyed = stream.withWatermark("ts", "10 minutes").withColumn(
        "cents", (F.col("value").cast("decimal(12,2)") * 100).cast("long")
    )
    out = ttl_flush_stream(
        keyed,
        ["user_id"],
        "user_id BIGINT, n_events BIGINT, total_cents BIGINT, "
        "last_ts TIMESTAMP",
        ttl_ms=ttl_min * 60 * 1000,
    )
    batches: list[tuple[int, list]] = []
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(
                lambda bdf, bid: batches.append(
                    (bid, [tuple(r) for r in bdf.collect()])
                )
            )
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    shutil.rmtree(root, ignore_errors=True)
    return batches


def test_flush_set_strictness_and_trailing_batch(spark):
    # key 1: last ts 00:10, timer 00:25.000 (ms-aligned).
    # f1 max = 00:35.000 -> eviction wm through f1 = 00:25.000 ==
    # the timer EXACTLY: must NOT fire in f2's batch (strict rule).
    # f2 max = 00:35.001 -> wm 00:25.001 > timer: fires in the
    # TRAILING no-data batch (id 3), proving both strictness and that
    # the trailing batch runs timeout processing.
    batches = _run(
        spark,
        "strict",
        [
            [(1, _t(0), 1.0), (1, _t(10), 2.5)],
            [(2, _t(35), 1.0)],
            [(3, _t(35) + timedelta(milliseconds=1), 1.0)],
        ],
    )
    flushed = {bid: rows for bid, rows in batches if rows}
    assert set(flushed) == {3}, batches
    (row,) = flushed[3]
    assert row[0] == 1  # user_id
    assert row[1] == 2  # n_events
    assert row[2] == 350  # exact cents: 1.00 + 2.50
    assert row[3] == _t(10)  # last_ts exact to the microsecond


def test_row_level_late_filter_two_batch_lag(spark):
    # f0 advances the filter watermark to 00:00 (max 00:10 - 10m).
    # f2 carries two late rows for key 1: 00:01 (above the batch-2
    # filter wm = through batch 0 = 00:00 -> ADMITTED) and 23:30 the
    # previous day (dropped) — the key is live either way, so a
    # window-end rule would have kept both. f1/f3 advance the
    # watermark so key 1 flushes before stream end.
    batches = _run(
        spark,
        "latefilter",
        [
            [(1, _t(0), 1.0), (1, _t(10), 1.0)],
            [(2, _t(60), 1.0)],
            [(1, _t(1), 4.0), (1, _t(-30), 8.0)],
            [(3, _t(180), 1.0)],
        ],
    )
    rows = [r for _, got in batches for r in got]
    by_key = {r[0]: r for r in rows}
    assert 1 in by_key, batches
    # 2 on-time + 1 admitted late; the 23:30 row (and its 8.00) gone
    assert by_key[1][1] == 3
    assert by_key[1][2] == 600
    assert by_key[1][3] == _t(10)


def test_clamped_timer_flushes_on_next_advance(spark):
    # Key 9's only row arrives in f2 at 00:05 — late enough that its
    # raw timer (00:20) is below the current eviction watermark
    # (00:50, from f1's 01:00 max): setTimeoutTimestamp would raise,
    # the operator clamps to wm+1ms, and the key flushes once f3
    # advances the watermark — membership is unchanged vs the raw
    # rule (00:20 < final wm 02:50).
    batches = _run(
        spark,
        "clamp",
        [
            [(1, _t(0), 1.0), (1, _t(10), 1.0)],
            [(2, _t(60), 1.0)],
            [(9, _t(5), 2.0)],
            [(3, _t(180), 1.0)],
        ],
    )
    rows = [r for _, got in batches for r in got]
    by_key = {r[0]: r for r in rows}
    assert 9 in by_key, batches
    assert by_key[9][1] == 1
    assert by_key[9][2] == 200


def test_flush_only_emission_and_withheld_keys(spark):
    # Every emitted row is a flush record (n_events > 0, one per
    # fired key); keys whose TTL has not elapsed at stream end (the
    # last batch's own keys) are withheld entirely.
    batches = _run(
        spark,
        "fireonly",
        [
            [(1, _t(0), 1.0), (1, _t(10), 1.0)],
            [(2, _t(60), 1.0)],
            [(3, _t(180), 1.0)],
        ],
    )
    rows = [r for _, got in batches for r in got]
    assert sorted(r[0] for r in rows) == [1, 2]  # 3 is withheld
    assert len(rows) == len({r[0] for r in rows})  # one row per key
