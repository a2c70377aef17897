#!/usr/bin/env python
"""Paired A/B for agg_mad_outliers' pass structure (r19).

BASE: rank-exact median via filtered window pass + broadcast join,
repeated for MAD (3 events scans, 2 window shuffles, 2 joins).
WIN : med and mad as window expressions over the SAME event_type
partitioning (guide §2.4): one scan, one exchange, two in-stage
sorts, no joins. Bit-identical rows (same doubles selected).

RSQES_VARIANT=base|win; RSQES_CHECK=1 compares rows at 3 SFs.
"""
import gc
import json
import os
import sys
import time

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES, load_table

SF = os.environ.get("SF", "/root/testdata/sf0.1")
VARIANT = os.environ.get("RSQES_VARIANT", "base")
CHECK = os.environ.get("RSQES_CHECK") == "1"


def build(spark, sf_dir, variant):
    v = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", F.col("value").cast("double").alias("x"))
    )
    if variant == "base":
        def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
            w = Window.partitionBy("event_type").orderBy(col)
            wc = Window.partitionBy("event_type")
            return (
                df.withColumn("_rn", F.row_number().over(w))
                .withColumn("_n", F.count(F.lit(1)).over(wc))
                .filter(F.col("_rn") == F.ceil(F.col("_n") / 2.0).cast("bigint"))
                .select("event_type", F.col(col).alias(out))
            )

        med = lower_median(v, "x", "med")
        d = v.join(F.broadcast(med), "event_type").select(
            "event_type", F.abs(F.col("x") - F.col("med")).alias("dev"), "med"
        )
        mad = lower_median(d.select("event_type", F.col("dev")), "dev", "mad")
        return (
            d.join(F.broadcast(mad), "event_type")
            .groupBy("event_type", "med", "mad")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.count(F.when(F.col("dev") > 1.5 * F.col("mad"), 1)).alias(
                    "n_outliers"
                ),
            )
        )
    wc = Window.partitionBy("event_type")
    w1 = Window.partitionBy("event_type").orderBy("x")
    d = (
        v.withColumn("_rn", F.row_number().over(w1))
        .withColumn("_n", F.count(F.lit(1)).over(wc))
        .withColumn(
            "med",
            F.max(
                F.when(
                    F.col("_rn") == F.ceil(F.col("_n") / 2.0).cast("bigint"),
                    F.col("x"),
                )
            ).over(wc),
        )
        .select(
            "event_type", F.abs(F.col("x") - F.col("med")).alias("dev"), "med"
        )
    )
    w2 = Window.partitionBy("event_type").orderBy("dev")
    dd = (
        d.withColumn("_rn2", F.row_number().over(w2))
        .withColumn("_n2", F.count(F.lit(1)).over(wc))
        .withColumn(
            "mad",
            F.max(
                F.when(
                    F.col("_rn2") == F.ceil(F.col("_n2") / 2.0).cast("bigint"),
                    F.col("dev"),
                )
            ).over(wc),
        )
    )
    return dd.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("dev") > 1.5 * F.col("mad"), 1)).alias("n_outliers"),
    )


spark = get_spark(app_name=f"pair-mad-{VARIANT}")
for t in TABLES:
    load_table(spark, SF, t).count()

if CHECK:
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF):
        rb = sorted(map(repr, (tuple(r) for r in build(spark, sf, "base").collect())))
        rw = sorted(map(repr, (tuple(r) for r in build(spark, sf, "win").collect())))
        print(sf, len(rb), len(rw), rb == rw)
    spark.stop()
    sys.exit(0)

build(spark, "/root/testdata/sf0.001", VARIANT).write.format("noop").mode("overwrite").save()
times = []
for _ in range(3):
    gc.collect()
    t0 = time.perf_counter()
    build(spark, SF, VARIANT).write.format("noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 4))
print(json.dumps({VARIANT: times}))
spark.stop()
