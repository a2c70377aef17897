#!/usr/bin/env python
"""Interleaved A/B for ngram_jaccard_pairs (r19): BASE (size-filter
pushed below the tokens+shingles projection — the shingle chain runs
2x per doc, once in the pushed Filter and once in the Project) vs
STAGED (truncate_lineage the projection, filter on the stored column —
one chain eval + a small materialization).

Runs dedup_ngram_jaccard's full shape. RSQES_VARIANT=staged selects;
RSQES_CHECK=1 compares sorted rows at 3 SFs.
"""
import gc
import json
import os
import time

from pyspark.sql import functions as F

from rs_query_engine_spark.functions.text import shingles, tokens
from rs_query_engine_spark.operators.dedup import _pairs_within
from rs_query_engine_spark.session import get_spark, truncate_lineage
from rs_query_engine_spark.sources.corpus import TABLES, load_table, spread

SF = os.environ.get("SF", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
VARIANT = os.environ.get("RSQES_VARIANT", "base")


def build(spark, sf_dir, staged):
    df = load_table(spark, sf_dir, "documents")
    t = spread(df).select(
        F.col("doc_id").alias("_id"),
        F.array_join(F.slice(tokens(F.col("text")), 1, 8), " ").alias("_blk"),
        F.array_distinct(shingles(F.col("text"), 3)).alias("_sh"),
    )
    if staged:
        t = truncate_lineage(t).filter(F.size("_sh") > 0)
    else:
        t = t.filter(F.size("_sh") > 0)
    buckets = (
        t.groupBy("_blk")
        .agg(F.collect_list(F.struct("_id", "_sh")).alias("docs"))
        .filter(F.size("docs") > 1)
    )
    pairs = buckets.select(
        F.explode(_pairs_within(F.col("docs"))).alias("p")
    ).select("p.*")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        pairs.select(
            "id_a", "id_b",
            F.try_divide(inter.cast("double"), union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.3)
    )


spark = get_spark(app_name="pair-ngramjac-r19")
for t in TABLES:
    load_table(spark, SF, t).count()

if os.environ.get("RSQES_CHECK"):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF):
        a = sorted(map(repr, (tuple(r) for r in build(spark, sf, False).collect())))
        b = sorted(map(repr, (tuple(r) for r in build(spark, sf, True).collect())))
        print(sf.rsplit("/", 1)[-1], "rows", len(a), "identical", a == b)
    spark.stop()
    raise SystemExit

staged = VARIANT == "staged"
build(spark, WARM, staged).write.format("noop").mode("overwrite").save()
gc.collect()
t0 = time.perf_counter()
build(spark, SF, staged).write.format("noop").mode("overwrite").save()
print(json.dumps({"variant": VARIANT,
                  "ngram_jaccard": round(time.perf_counter() - t0, 4)}))
spark.stop()
