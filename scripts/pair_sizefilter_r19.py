#!/usr/bin/env python
"""Interleaved A/B for the pushed-down size-filter fix (r19):
text_winnowing_fingerprints and text_contamination_check, BASE (with
the filter(size(sh) > 0) Catalyst pushes below the shingle projection,
re-evaluating the chain per row) vs NOFILTER (the r19 spelling — the
explode drops empty arrays for free).

RSQES_VARIANT=nofilter selects the variant; RSQES_CHECK=1 compares
sorted rows of both spellings at 3 SFs.
"""
import gc
import json
import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from rs_query_engine_spark.functions.text import shingles
from rs_query_engine_spark.session import get_spark, truncate_lineage
from rs_query_engine_spark.sources.corpus import TABLES, load_table, spread

SF = os.environ.get("SF", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
VARIANT = os.environ.get("RSQES_VARIANT", "base")


def winnowing(spark, sf_dir, with_filter):
    # NOTE: dropping the filter is a plan NO-OP — InferFiltersFromGenerate
    # re-adds size(sh) > 0 below the Generate and pushes it under the
    # projection. The live variant is STAGED: truncate_lineage(sh) so the
    # inferred filter lands on a stored column (1 shingle eval, not 3).
    d = load_table(spark, sf_dir, "documents")
    sh = d.select("doc_id", shingles(F.col("text"), 3).alias("sh"))
    if with_filter:
        sh = sh.filter(F.size("sh") > 0)
    if os.environ.get("RSQES_STAGE_WINNOW"):
        sh = truncate_lineage(sh)
    g = sh.select(
        "doc_id",
        F.size("sh").alias("n_grams"),
        F.posexplode("sh").alias("i0", "gram"),
    )
    h = F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint")
    w = Window.partitionBy("doc_id").orderBy("i0").rowsBetween(0, 3)
    return (
        g.select("doc_id", "n_grams", "i0", F.min(h).over(w).alias("fp"))
        .filter(F.col("i0") <= F.col("n_grams") - 4)
        .groupBy("doc_id")
        .agg(
            F.count_distinct("fp").alias("n_fps"),
            F.min("fp").alias("fp_min"),
            F.max("fp").alias("fp_max"),
        )
    )


def contamination(spark, sf_dir, with_filter):
    d = load_table(spark, sf_dir, "documents")
    grams = spread(d).select(
        "doc_id", F.array_distinct(shingles(F.col("text"), 5)).alias("sh")
    )
    if with_filter:
        grams = grams.filter(F.size("sh") > 0)
    grams = truncate_lineage(grams)
    bench = grams.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.explode("sh").alias("gram"),
        F.size("sh").alias("n_bench"),
    )
    corpus = grams.select("doc_id", F.explode("sh").alias("gram"))
    hits = corpus.join(
        F.broadcast(bench),
        (corpus["gram"] == bench["gram"])
        & (corpus["doc_id"] != bench["bench_id"]),
    )
    return (
        hits.groupBy("doc_id", "bench_id", "n_bench")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap").cast("double") / F.col("n_bench") >= 0.2)
        .select(
            "doc_id", "bench_id", "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_bench")).alias(
                "contamination"
            ),
        )
    )


BUILDERS = {"winnowing": winnowing, "contamination": contamination}

spark = get_spark(app_name="pair-sizefilter-r19")
for t in TABLES:
    load_table(spark, SF, t).count()

if os.environ.get("RSQES_CHECK"):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF):
        for name, fn in BUILDERS.items():
            a = sorted(map(repr, (tuple(r) for r in fn(spark, sf, True).collect())))
            b = sorted(map(repr, (tuple(r) for r in fn(spark, sf, False).collect())))
            print(sf.rsplit("/", 1)[-1], name, "rows", len(a), "identical", a == b)
    spark.stop()
    raise SystemExit

with_filter = VARIANT == "base"
out = {"variant": VARIANT}
for name, fn in BUILDERS.items():
    fn(spark, WARM, with_filter).write.format("noop").mode("overwrite").save()
    gc.collect()
    t0 = time.perf_counter()
    fn(spark, SF, with_filter).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 4)
print(json.dumps(out))
spark.stop()
