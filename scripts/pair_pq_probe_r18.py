#!/usr/bin/env python
"""Interleaved paired A/B for the probe_pq_index probe-batch staging
(round 18). One invocation = ONE arm in a fresh process; the wrapper
loop below (``--loop N``) alternates base/changed so machine drift
hits both arms equally (the r18 stall-period methodology).

Arm "base" monkeypatches ivf_index.truncate_lineage to identity —
exactly the pre-change spelling — so both arms run the same tree.
Timed: bench-shaped (table-count warmup, sf0.001 warm pass, then one
timed sf0.1 noop run per query) for the two probe_pq_index consumers.
"""
import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ("similarity_pq_index_probe", "similarity_pq_refine")
SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"


def run_arm(arm: str) -> dict:
    import rs_query_engine_spark.operators.ivf_index as ix

    if arm == "base":
        ix.truncate_lineage = lambda df: df
    from rs_query_engine_spark import queries as registry
    from rs_query_engine_spark.session import get_spark
    from rs_query_engine_spark.sources.corpus import TABLES, load_table

    spark = get_spark(app_name=f"pair-pq-{arm}")
    qs = registry.queries()
    for t in TABLES:
        load_table(spark, SF, t).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # untimed: artifact ensure + codegen warm at both SFs
    for name in QUERIES:
        noop(qs[name](spark, WARM))
        noop(qs[name](spark, SF))
    out = {}
    for name in QUERIES:
        gc.collect()
        t0 = time.perf_counter()
        noop(qs[name](spark, SF))
        out[name] = round(time.perf_counter() - t0, 4)
    spark.stop()
    return out


if __name__ == "__main__":
    if sys.argv[1] == "--loop":
        n = int(sys.argv[2])
        pairs = []
        for i in range(n):
            row = {}
            for arm in ("base", "changed"):
                r = subprocess.run(
                    [sys.executable, __file__, arm],
                    capture_output=True, text=True, cwd=os.path.dirname(
                        os.path.dirname(os.path.abspath(__file__)))
                )
                row[arm] = json.loads(r.stdout.strip().splitlines()[-1])
            pairs.append(row)
            for q in QUERIES:
                b, c = row["base"][q], row["changed"][q]
                print(f"pair {i} {q}: base {b:.3f} changed {c:.3f} "
                      f"ratio {c/b:.3f}", flush=True)
        for q in QUERIES:
            rs = sorted(p["changed"][q] / p["base"][q] for p in pairs)
            med = rs[len(rs) // 2] if len(rs) % 2 else (
                rs[len(rs) // 2 - 1] + rs[len(rs) // 2]) / 2
            print(f"MEDIAN {q}: {med:.3f}  (ratios {['%.2f' % r for r in rs]})")
    else:
        print(json.dumps(run_arm(sys.argv[1])))
