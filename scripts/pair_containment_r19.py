#!/usr/bin/env python
"""Paired A/B for dedup_containment_pairs' inv_df derivation (r19).

BASE: inv.groupBy(shingle).count() + join-back (the r15-r18 spelling:
postings shuffled twice).
WIN : count(1) OVER (PARTITION BY shingle) in the pass that already
shuffles the postings (guide §2.4; the r18 spans/novelty pattern).

One fresh-session run per invocation; RSQES_VARIANT=base|win selects
the spelling. Rows compared via sorted collect when RSQES_CHECK=1.
"""
import gc
import json
import os
import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from rs_query_engine_spark.session import get_spark, truncate_lineage
from rs_query_engine_spark.functions.text import shingles
from rs_query_engine_spark.sources.corpus import TABLES, load_table, spread

SF = os.environ.get("SF", "/root/testdata/sf0.1")
VARIANT = os.environ.get("RSQES_VARIANT", "base")
CHECK = os.environ.get("RSQES_CHECK") == "1"

shingle_n, threshold, probe_frac, max_df = 3, 0.8, 0.2, 1000


def build(spark, sf_dir, variant):
    df = load_table(spark, sf_dir, "documents")
    sh = (
        spread(df)
        .select(
            F.col("doc_id").alias("_id"),
            F.array_distinct(shingles(F.col("text"), shingle_n)).alias("_sh"),
        )
        .filter(F.size("_sh") > 0)
        .transform(truncate_lineage)
    )
    inv = sh.select(F.col("_id").alias("id_b"), F.explode("_sh").alias("shingle"))
    if variant == "base":
        df_counts = inv.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        inv_df = inv.join(df_counts, "shingle").transform(truncate_lineage)
    else:
        inv_df = inv.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        ).transform(truncate_lineage)
    ranked = (
        inv_df.withColumnRenamed("id_b", "id_a")
        .groupBy("id_a")
        .agg(F.array_sort(F.collect_list(F.struct("df", "shingle"))).alias("_r"))
    )
    k = F.floor(F.lit(probe_frac) * F.size("_r")).cast("int") + F.lit(1)
    probes = ranked.select(
        "id_a", F.explode(F.slice(F.col("_r"), F.lit(1), k)).alias("_p")
    ).select("id_a", F.col("_p.shingle").alias("shingle"))
    inv_ok = inv_df.filter(F.col("df") <= max_df).select("id_b", "shingle")
    cand = (
        probes.join(inv_ok, "shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    cont = F.size(F.array_intersect("_sha", "_shb")).cast("double") / F.size("_sha")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", cont.alias("containment"))
        .filter(F.col("containment") >= threshold)
    )


spark = get_spark(app_name=f"pair-containment-{VARIANT}")
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
for _ in range(2):
    gc.collect()
    t0 = time.perf_counter()
    build(spark, SF, VARIANT).write.format("noop").mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 4))
print(json.dumps({VARIANT: times}))
spark.stop()
