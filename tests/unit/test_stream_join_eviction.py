"""Pin the eviction-vs-late-filter ordering for watermarked inner
stream-stream joins — the argument that makes
``stream_stream_join_late``'s oracle complete.

Claim (measured, and provable from the two lags): for an INNER
stream-stream join whose state retention bounds derive from the join
condition, state eviction can never change the emitted pair set —
eviction at the end of batch M uses the watermark from data through
M-1, while the late filter of any later arrival batch N uses data
through N-2 ⊇ M-1, and the join bounds order the two endpoints'
event times; so any row that could have paired with an evicted
partner is itself always dropped as late first. Eviction is purely a
memory bound.

Consequence: an exact oracle needs only the per-side acceptance rule
(raw event time vs the two-batch-lagged min-of-sides watermark),
never an eviction replay. A Spark version that evicts EARLIER than
its late filter would break this and must fail here loudly.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

SCHEMA = "etype string, u bigint, ts timestamp, eid string"


def _t(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m)


def _run_join(spark, name: str, files: list[list[tuple]]):
    root = os.path.join(
        tempfile.gettempdir(), f"rsqes_test_ssjoin_{name}_{os.getpid()}"
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
        shutil.rmtree(staging)
        mt = 1_700_000_000 + i * 10
        os.utime(dst, (mt, mt))
    schema = spark.read.parquet(feed).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    views = (
        stream.filter(F.col("etype") == "view")
        .select(
            F.col("u").alias("vu"),
            F.col("ts").alias("view_ts"),
            F.col("eid").alias("vid"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purch = (
        stream.filter(F.col("etype") == "purchase")
        .select(
            F.col("u").alias("pu"),
            F.col("ts").alias("purchase_ts"),
            F.col("eid").alias("pid"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = views.join(
        purch,
        (F.col("vu") == F.col("pu"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 10 MINUTES")),
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(f"ssjoin_{name}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql(f"SELECT vid, pid FROM ssjoin_{name}").collect()
    shutil.rmtree(root, ignore_errors=True)
    return sorted((r["vid"], r["pid"]) for r in rows)


def test_late_filter_subsumes_eviction(spark):
    """V1@10:00's retention bound is 10:10; after the movers push the
    watermark to 19:00 and the spacer batch lets eviction run, a
    matching purchase @10:05 arrives — it is dropped by the LATE
    FILTER (10:05 < 19:00), so whether V1's state was evicted is
    unobservable. No (V1, P1) pair either way; the mover pairs prove
    the join itself is live."""
    emitted = _run_join(
        spark,
        "kill",
        [
            [("view", 1, _t(10), "V1"), ("view", 9, _t(20), "MV0"), ("purchase", 9, _t(20), "MP0")],
            [("view", 8, _t(20), "MV1"), ("purchase", 8, _t(20), "MP1")],
            [("view", 7, _t(20), "MV2"), ("purchase", 7, _t(20), "MP2")],
            [("purchase", 1, _t(10, 5), "P1")],
        ],
    )
    assert emitted == sorted([("MV0", "MP0"), ("MV1", "MP1"), ("MV2", "MP2")])


def test_cross_batch_pair_survives_until_filter_line(spark):
    """The positive complement: V4@11:30 (bound 11:40) paired by
    P4@11:35 arriving two batches later, while the filter line for
    that batch is still 11:00 — the pair emits, proving buffered
    state spans batches right up to the late-filter boundary and the
    two-batch filter lag is real (the REPORTED watermark at the
    arrival batch is already 15:00)."""
    emitted = _run_join(
        spark,
        "keep",
        [
            [("view", 9, _t(12), "MV0"), ("purchase", 9, _t(12), "MP0"), ("view", 4, _t(11, 30), "V4")],
            [("view", 8, _t(16), "MV1"), ("purchase", 8, _t(16), "MP1")],
            [("purchase", 4, _t(11, 35), "P4")],
        ],
    )
    assert emitted == sorted([("MV0", "MP0"), ("MV1", "MP1"), ("V4", "P4")])
