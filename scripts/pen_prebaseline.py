#!/usr/bin/env python
"""Pre-baseline timings for a holding-pen module's queries: the same
measurement shape as scripts/control_r14.py (fresh-session warmup at
sf0.001, then 3 timed solo runs at sf0.1 to a noop sink, gc between)
so the BENCH_NOTES pen ledger entries are directly comparable to the
control and to bench.py rows once the pen flips.

Usage:
    PYTHONPATH=/root/repo python scripts/pen_prebaseline.py \
        rs_query_engine_spark.queries_staged_r18 [name ...]
"""
import gc
import importlib
import json
import sys
import time

from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES, load_table

mod = importlib.import_module(sys.argv[1])
NAMES = sys.argv[2:] or sorted(mod.queries())
SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

spark = get_spark(app_name="pen-prebaseline")
qs = mod.queries()
for t in TABLES:
    load_table(spark, SF, t).count()


def run_full(df):
    df.write.format("noop").mode("overwrite").save()


out = {}
for name in NAMES:
    fn = qs[name]
    run_full(fn(spark, WARM))
    times = []
    for _ in range(3):
        gc.collect()
        t0 = time.perf_counter()
        run_full(fn(spark, SF))
        times.append(round(time.perf_counter() - t0, 4))
    out[name] = times
    print(f"# {name}: {times}", file=sys.stderr)
print(json.dumps(out))
spark.stop()
