#!/usr/bin/env python
"""Identity + paired timing for the LAST unswept stream confs (r19):
stream_parquet_sink / stream_ivm_maintenance (run_stream_to_parquet)
and source_rate_micro_batch (run_stream_to_memory, never swept).

Modes (first arg):
  identity — run each named query base-vs-forced in one session at
             every SF in $SFS, compare full sorted rows.
  time     — ONE fresh-session timed run of the named queries at $SF
             (bench shape: noop sink, gc between), JSON on stdout.
             RSQES_STREAM_PARTS forces state_partitions for BOTH
             run_stream_to_parquet and run_stream_to_memory when set.

Usage:
  RSQES_STREAM_PARTS=2 python scripts/stream_sink_sweep_r19.py identity q...
  [RSQES_STREAM_PARTS=2] python scripts/stream_sink_sweep_r19.py time q...
"""
import gc
import json
import os
import sys
import time

import rs_query_engine_spark.streaming.events as ev
from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark

MODE = sys.argv[1]
NAMES = sys.argv[2:]
FORCED = os.environ.get("RSQES_STREAM_PARTS")

_orig_mem = ev.run_stream_to_memory
_orig_pq = ev.run_stream_to_parquet
_force = {"on": FORCED is not None}


def patched_mem(stream_df, query_name, output_mode="complete",
                state_partitions=8, available_now=False):
    if _force["on"]:
        state_partitions = int(FORCED)
    return _orig_mem(stream_df, query_name, output_mode=output_mode,
                     state_partitions=state_partitions,
                     available_now=available_now)


def patched_pq(stream_df, path, checkpoint_dir, output_mode="append",
               state_partitions=8, transform_fn=None):
    if _force["on"]:
        state_partitions = int(FORCED)
    return _orig_pq(stream_df, path, checkpoint_dir,
                    output_mode=output_mode,
                    state_partitions=state_partitions,
                    transform_fn=transform_fn)


ev.run_stream_to_memory = patched_mem
ev.run_stream_to_parquet = patched_pq

spark = get_spark(app_name="stream-sink-sweep-r19")
qs = registry.queries()

if MODE == "identity":
    sfs = os.environ.get(
        "SFS",
        "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1",
    ).split(",")
    bad = 0
    for sf in sfs:
        for name in NAMES:
            fn = qs[name]
            _force["on"] = False
            base = sorted(map(repr, (tuple(r) for r in fn(spark, sf).collect())))
            _force["on"] = True
            test = sorted(map(repr, (tuple(r) for r in fn(spark, sf).collect())))
            _force["on"] = False
            ok = base == test
            bad += not ok
            print(f"{sf.rsplit('/', 1)[-1]} {name}: base_rows={len(base)} "
                  f"forced({FORCED})_rows={len(test)} identical={ok}")
            if not ok:
                tset, bset = set(test), set(base)
                print("  only_base:", [r for r in base if r not in tset][:3])
                print("  only_forced:", [r for r in test if r not in bset][:3])
    print("IDENTITY", "FAIL" if bad else "PASS")
    spark.stop()
    sys.exit(1 if bad else 0)

sf = os.environ.get("SF", "/root/testdata/sf0.1")
out = {}
for name in NAMES:
    fn = qs[name]
    gc.collect()
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 4)
print(json.dumps(out))
spark.stop()
