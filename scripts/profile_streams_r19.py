#!/usr/bin/env python
"""Round-19 streaming-family profiler (guide §1: measure first).

For each named stream query: run it once at $SF (default sf0.1) with
``run_stream_to_memory`` instrumented to capture the StreamingQuery's
``recentProgress`` — the per-micro-batch ``durationMs`` breakdown
(addBatch / getBatch / queryPlanning / walCommit / commitOffsets /
triggerExecution) and per-operator state-store commit times — plus
wall-clock split into DataFrame-construction (everything before the
stream starts: feed artifact lookup, schema probe) vs stream drive vs
post-stream batch collect.

Usage: python scripts/profile_streams_r19.py [query ...]
Defaults to the heavy rows from BENCH_r18.
"""
import json
import os
import sys
import time

import rs_query_engine_spark.streaming.events as ev
from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark

SF = os.environ.get("SF", "/root/testdata/sf0.1")

DEFAULT = [
    "stream_ttl_flush_ledger",
    "stream_chained_stateful",
    "stream_stream_join_late",
    "stream_stream_full_outer_late",
    "stream_stream_left_outer_late",
    "stream_late_data_drop",
    "stream_window_approx_distinct",
    "stream_stream_join",
]

NAMES = sys.argv[1:] or DEFAULT

PROGRESS: dict[str, list] = {}
DRIVE: dict[str, dict] = {}

_orig = ev.run_stream_to_memory


def instrumented(stream_df, query_name, output_mode="complete",
                 state_partitions=8, available_now=False):
    spark = stream_df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    t_start = time.perf_counter()
    try:
        writer = stream_df.writeStream.outputMode(output_mode).format(
            "memory").queryName(query_name)
        if available_now:
            writer = writer.trigger(availableNow=True)
        q = writer.start()
        t_started = time.perf_counter()
        try:
            if available_now:
                q.awaitTermination()
            else:
                q.processAllAvailable()
            t_drained = time.perf_counter()
            PROGRESS[query_name] = [json.loads(p.json) for p in q.recentProgress]
        finally:
            q.stop()
        t_stopped = time.perf_counter()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    DRIVE[query_name] = {
        "start_sec": round(t_started - t_start, 3),
        "drain_sec": round(t_drained - t_started, 3),
        "stop_sec": round(t_stopped - t_drained, 3),
        "state_partitions": state_partitions,
    }
    return spark.sql(f"SELECT * FROM {query_name}")


ev.run_stream_to_memory = instrumented

spark = get_spark(app_name="profile-streams-r19")
qs = registry.queries()

out = {}
for name in NAMES:
    fn = qs[name]
    t0 = time.perf_counter()
    df = fn(spark, SF)
    t1 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    t2 = time.perf_counter()
    batches = []
    for p in PROGRESS.get(name, []):
        dm = p.get("durationMs", {})
        ops = [
            {
                "rows": so.get("numRowsTotal"),
                "updated": so.get("numRowsUpdated"),
                "commitMs": so.get("commitTimeMs"),
                "mem": so.get("memoryUsedBytes"),
            }
            for so in p.get("stateOperators", [])
        ]
        batches.append({
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "durationMs": dm,
            "stateOperators": ops,
        })
    out[name] = {
        "construct_sec": round(t1 - t0, 3),
        "total_sec": round(t2 - t0, 3),
        "drive": DRIVE.get(name),
        "batches": batches,
    }
    print(f"# {name}: total {t2 - t0:.2f}s construct {t1 - t0:.2f}s "
          f"drive {DRIVE.get(name)}", file=sys.stderr)

print(json.dumps(out, indent=1))
spark.stop()
