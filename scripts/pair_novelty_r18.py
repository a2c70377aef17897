#!/usr/bin/env python
"""Interleaved paired A/B for the text_ngram_novelty
window-instead-of-join-back rewrite (round 18). Base arm inlines the
pre-change spelling (groupBy df + join back); changed arm runs the
registry version. One arm per fresh process; --loop alternates."""
import gc
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.1"
WARM = "/root/testdata/sf0.001"


def base_query(spark, sf_dir):
    from pyspark.sql import functions as F

    from rs_query_engine_spark.functions.text import shingles
    from rs_query_engine_spark.queries import _t
    from rs_query_engine_spark.sources.corpus import spread

    d = _t(spark, sf_dir, "documents")
    x = spread(d).select(
        "doc_id",
        F.explode(F.array_distinct(shingles(F.col("text"), 3))).alias("g"),
    )
    dfc = x.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    return (
        x.join(dfc, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            (
                F.count(F.when(F.col("df") == 1, 1)).cast("double")
                / F.count(F.lit(1))
            ).alias("novelty"),
        )
    )


def run_arm(arm: str) -> dict:
    from rs_query_engine_spark import queries as registry
    from rs_query_engine_spark.session import get_spark
    from rs_query_engine_spark.sources.corpus import TABLES, load_table

    spark = get_spark(app_name=f"pair-novelty-{arm}")
    fn = base_query if arm == "base" else registry.queries()["text_ngram_novelty"]
    for t in TABLES:
        load_table(spark, SF, t).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(fn(spark, WARM))
    noop(fn(spark, SF))
    gc.collect()
    t0 = time.perf_counter()
    noop(fn(spark, SF))
    out = {"text_ngram_novelty": round(time.perf_counter() - t0, 4)}
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
                    capture_output=True, text=True)
                row[arm] = json.loads(r.stdout.strip().splitlines()[-1])
            pairs.append(row)
            b, c = (row["base"]["text_ngram_novelty"],
                    row["changed"]["text_ngram_novelty"])
            print(f"pair {i}: base {b:.3f} changed {c:.3f} ratio {c/b:.3f}",
                  flush=True)
        rs = sorted(p["changed"]["text_ngram_novelty"]
                    / p["base"]["text_ngram_novelty"] for p in pairs)
        med = rs[len(rs) // 2] if len(rs) % 2 else (
            rs[len(rs) // 2 - 1] + rs[len(rs) // 2]) / 2
        print(f"MEDIAN: {med:.3f}  (ratios {['%.2f' % r for r in rs]})")
    else:
        print(json.dumps(run_arm(sys.argv[1])))
