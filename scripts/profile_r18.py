#!/usr/bin/env python
"""Round-18 optimization profiling (guide §1: measure first).

For every live query: time (a) DataFrame CONSTRUCTION (the py4j/
driver-side cost of building the plan — inside bench.py's timer) and
(b) EXECUTION to the noop sink, after the same fresh-session warmup
bench.py uses. Also dumps `.explain("formatted")` for every query to
plans/r18/capture/<name>.txt so plan-shape anti-patterns can be
grepped offline (Exchange counts, join strategies, BatchEvalPython,
PushedFilters).

Usage: python scripts/profile_r18.py [name ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
Output: one JSON line {name: {"build": s, "exec": s}} on stdout;
plans under plans/r18/capture/.
"""
import gc
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES, load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PLAN_DIR = os.path.join(REPO, "plans", "r18", "capture")
os.makedirs(PLAN_DIR, exist_ok=True)

spark = get_spark(app_name="profile-r18")
qs = registry.queries()
names = sys.argv[1:] or sorted(qs)

for t in TABLES:
    load_table(spark, SF, t).count()


def run_full(df):
    df.write.format("noop").mode("overwrite").save()


# warm pass at sf0.001 (same as bench.py; skip streams)
for name in names:
    if name.startswith("stream_"):
        continue
    try:
        run_full(qs[name](spark, WARM))
    except Exception as exc:
        print(f"# warmup {name} failed: {exc}", file=sys.stderr)

out = {}
for name in names:
    fn = qs[name]
    gc.collect()
    t0 = time.perf_counter()
    df = fn(spark, SF)
    t1 = time.perf_counter()
    # capture the formatted plan (analysis cost charged to build side
    # of the ledger is fine — explain runs analysis+optimization)
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(PLAN_DIR, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue())
    except Exception as exc:
        print(f"# explain {name} failed: {exc}", file=sys.stderr)
    t2 = time.perf_counter()
    run_full(df)
    t3 = time.perf_counter()
    out[name] = {
        "build": round(t1 - t0, 4),
        "plan": round(t2 - t1, 4),
        "exec": round(t3 - t2, 4),
    }
    print(f"# {name}: build={out[name]['build']:.3f} plan={out[name]['plan']:.3f} exec={out[name]['exec']:.3f}", file=sys.stderr)

print(json.dumps(out))
spark.stop()
