#!/usr/bin/env python
"""Round-14 probe (VERDICT r13 next-#6): can conf-level levers cut the
JVM-stateful fixed-cost family (stream_chained_stateful + the three
stream_stream_*_late) without touching semantics?

Levers probed per query, ×2 warm solo at sf0.1:
  base     — as committed
  rocksdb  — spark.sql.streaming.stateStore.providerClass = RocksDB
  retain   — spark.sql.streaming.minBatchesToRetain = 2
Each variant also collects the result and compares row multisets to
the base run — a variant that changes ANY emitted row is disqualified
on the spot.
"""
import gc
import json
import sys
import time

from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES, load_table

NAME = sys.argv[1]
VARIANT = sys.argv[2]
SF = "/root/testdata/sf0.1"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)

spark = get_spark(app_name=f"probe-{NAME}-{VARIANT}")
if VARIANT == "rocksdb":
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB
    )
elif VARIANT == "retain":
    spark.conf.set("spark.sql.streaming.minBatchesToRetain", "2")

qs = registry.queries()
for t in TABLES:
    load_table(spark, SF, t).count()

fn = qs[NAME]
times = []
rows = None
for i in range(2):
    gc.collect()
    t0 = time.perf_counter()
    df = fn(spark, SF)
    rows = sorted(map(repr, (tuple(r) for r in df.collect())))
    times.append(round(time.perf_counter() - t0, 4))
    print(f"# {NAME} {VARIANT} run{i}: {times[-1]}", file=sys.stderr)
import hashlib

h = hashlib.md5("\n".join(rows).encode()).hexdigest()[:12]
print(json.dumps({"name": NAME, "variant": VARIANT, "times": times,
                  "n_rows": len(rows), "hash": h}))
spark.stop()
