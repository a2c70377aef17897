#!/usr/bin/env python
"""Result-identity check for stream state_partitions overrides (r19).

For each named stream query, runs it twice in one session — once with
the registry's own state_partitions, once with RSQES_STREAM_PARTS
forced via the run_stream_to_memory override — and compares the full
sorted collected rows. Repeats at every SF dir given.

Usage:
  RSQES_STREAM_PARTS=2 python scripts/stream_sp_identity_r19.py q1 q2 ...
"""
import os
import sys

import rs_query_engine_spark.streaming.events as ev
from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark

FORCED = int(os.environ["RSQES_STREAM_PARTS"])
SFS = os.environ.get(
    "SFS", "/root/testdata/sf0.001,/root/testdata/sf0.01,/root/testdata/sf0.1"
).split(",")
NAMES = sys.argv[1:]

_orig = ev.run_stream_to_memory
_force = {"on": False}


def patched(stream_df, query_name, output_mode="complete",
            state_partitions=8, available_now=False):
    if _force["on"]:
        state_partitions = FORCED
    return _orig(stream_df, query_name, output_mode=output_mode,
                 state_partitions=state_partitions,
                 available_now=available_now)


ev.run_stream_to_memory = patched

spark = get_spark(app_name="stream-sp-identity-r19")
qs = registry.queries()

bad = 0
for sf in SFS:
    for name in NAMES:
        fn = qs[name]
        _force["on"] = False
        base = sorted(map(repr, (tuple(r) for r in fn(spark, sf).collect())))
        _force["on"] = True
        test = sorted(map(repr, (tuple(r) for r in fn(spark, sf).collect())))
        _force["on"] = False
        ok = base == test
        bad += not ok
        print(f"{sf.rsplit('/',1)[-1]} {name}: base_rows={len(base)} "
              f"forced({FORCED})_rows={len(test)} identical={ok}")
        if not ok:
            only_b = [r for r in base if r not in set(test)][:3]
            only_t = [r for r in test if r not in set(base)][:3]
            print("  only_base:", only_b)
            print("  only_forced:", only_t)
print("IDENTITY", "FAIL" if bad else "PASS")
spark.stop()
sys.exit(1 if bad else 0)
