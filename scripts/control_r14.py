#!/usr/bin/env python
"""Round-start machine-factor control runs (VERDICT r13 next-#8/#4).

For each named query: fresh-session warmup (table counts + one
sf0.001 pass), then 3 timed solo runs at sf0.1 with gc between —
the same measurement shape as bench.py's timed section and the
r10–r13 control entries in BENCH_NOTES.
"""
import gc
import json
import sys
import time

from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES, load_table

NAMES = sys.argv[1:]
SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"

spark = get_spark(app_name="control-r14")
qs = registry.queries()
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
