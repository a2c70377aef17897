#!/usr/bin/env python
"""A/B a session-config change over a deterministic query subset.

Bench-shaped methodology (table-count warmup, one sf0.001 pass per
query, then one timed sf0.1 run each with gc between) over every
K-th live non-streaming query (sorted order), so one side of an A/B
takes minutes instead of a full bench run. Streaming queries are
excluded: their cost is stream startup + state-store provisioning,
which session-level codegen/planning knobs do not touch, and their
micro-batch timers add noise that would wash out the signal.

Usage: python scripts/ab_subset_r18.py [K] > out.json
Env: the knob under test (e.g. RSQES_CODEGEN_CACHE_ENTRIES) must be
exported before launch — get_spark reads it at session build. For
arbitrary session conf, set RSQES_AB_CONF to "k=v;k=v" pairs.
"""
import gc
import json
import os
import sys
import time

from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES, load_table

K = int(sys.argv[1]) if len(sys.argv) > 1 else 3
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"

_extra = dict(
    kv.split("=", 1)
    for kv in os.environ.get("RSQES_AB_CONF", "").split(";")
    if "=" in kv
)
spark = get_spark(app_name="ab-subset-r18", extra_conf=_extra or None)
qs = registry.queries()
names = [n for i, n in enumerate(sorted(qs)) if i % K == 0
         and not n.startswith("stream_")]

for t in TABLES:
    load_table(spark, SF, t).count()


def run_full(df):
    df.write.format("noop").mode("overwrite").save()


for name in names:
    try:
        run_full(qs[name](spark, WARM))
    except Exception as exc:
        print(f"# warmup {name} failed: {exc}", file=sys.stderr)

out = {}
for name in names:
    gc.collect()
    t0 = time.perf_counter()
    run_full(qs[name](spark, SF))
    out[name] = round(time.perf_counter() - t0, 4)
    print(f"# {name}: {out[name]:.3f}s", file=sys.stderr)

print(json.dumps({"conf": {
    "codegen_cache": spark.conf.get("spark.sql.codegen.cache.maxEntries",
                                    "default"),
    "ab_conf": _extra,
}, "total": round(sum(out.values()), 4), "queries": out}))
spark.stop()
