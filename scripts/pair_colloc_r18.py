#!/usr/bin/env python
"""Interleaved paired A/B for the text_collocation_pmi_rank
single-join rewrite (round 18). Base arm inlines the pre-change
two-join spelling; changed arm runs the registry version."""
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
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from rs_query_engine_spark.functions.text import shingles, tokens
    from rs_query_engine_spark.queries_staged_r15 import (
        _COLLOC_MIN_COUNT,
        _COLLOC_TOP_K,
        _t,
    )

    d = _t(spark, sf_dir, "documents")
    cab = (
        d.select("lang", F.explode(shingles(F.col("text"), 2)).alias("bg"))
        .groupBy("lang", "bg")
        .agg(F.count(F.lit(1)).alias("cnt_ab"))
        .filter(F.col("cnt_ab") >= _COLLOC_MIN_COUNT)
    )
    cw = (
        d.select("lang", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("cnt_w"))
    )
    parts = F.split(F.col("bg"), " ")
    sc = (
        cab.withColumn("w1", parts.getItem(0))
        .withColumn("w2", parts.getItem(1))
        .join(cw.withColumnRenamed("w", "w1").withColumnRenamed("cnt_w", "cnt_a"),
              ["lang", "w1"])
        .join(cw.withColumnRenamed("w", "w2").withColumnRenamed("cnt_w", "cnt_b"),
              ["lang", "w2"])
        .withColumn(
            "score",
            F.col("cnt_ab").cast("double")
            / (F.col("cnt_a") * F.col("cnt_b")).cast("double"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("score").desc(), F.col("bg"))
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _COLLOC_TOP_K)
        .select("lang", F.col("bg").alias("bigram"),
                "cnt_ab", "cnt_a", "cnt_b", "score")
    )


def run_arm(arm: str) -> dict:
    from rs_query_engine_spark import queries as registry
    from rs_query_engine_spark.session import get_spark
    from rs_query_engine_spark.sources.corpus import TABLES, load_table

    spark = get_spark(app_name=f"pair-colloc-{arm}")
    fn = (base_query if arm == "base"
          else registry.queries()["text_collocation_pmi_rank"])
    for t in TABLES:
        load_table(spark, SF, t).count()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(fn(spark, WARM))
    noop(fn(spark, SF))
    gc.collect()
    t0 = time.perf_counter()
    noop(fn(spark, SF))
    out = {"t": round(time.perf_counter() - t0, 4)}
    spark.stop()
    return out


if __name__ == "__main__":
    if sys.argv[1] == "--loop":
        n = int(sys.argv[2])
        pairs = []
        for i in range(n):
            row = {}
            for arm in ("base", "changed"):
                r = subprocess.run([sys.executable, __file__, arm],
                                   capture_output=True, text=True)
                row[arm] = json.loads(r.stdout.strip().splitlines()[-1])
            pairs.append(row)
            b, c = row["base"]["t"], row["changed"]["t"]
            print(f"pair {i}: base {b:.3f} changed {c:.3f} ratio {c/b:.3f}",
                  flush=True)
        rs = sorted(p["changed"]["t"] / p["base"]["t"] for p in pairs)
        med = rs[len(rs) // 2] if len(rs) % 2 else (
            rs[len(rs) // 2 - 1] + rs[len(rs) // 2]) / 2
        print(f"MEDIAN: {med:.3f}  (ratios {['%.2f' % r for r in rs]})")
    else:
        print(json.dumps(run_arm(sys.argv[1])))
