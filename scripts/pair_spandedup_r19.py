#!/usr/bin/env python
"""Interleaved A/B for text_span_dedup (r19): BASE (span pipeline
derived twice — winners agg + join-back) vs STAGED (localCheckpoint
the span frame once, both consumers read the stored blocks).

One fresh-session timed run per invocation (bench shape: sf0.001 warm
pass for this query, then noop-sink timed at $SF). RSQES_VARIANT=staged
selects the variant. RSQES_CHECK=1 additionally collects both spellings
and compares sorted rows.

Usage: [RSQES_VARIANT=staged] python scripts/pair_spandedup_r19.py
"""
import gc
import json
import os
import time

from pyspark.sql import functions as F

from rs_query_engine_spark.functions.text import chunk_spans
from rs_query_engine_spark.session import get_spark, truncate_lineage
from rs_query_engine_spark.sources.corpus import TABLES, load_table, spread

SF = os.environ.get("SF", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
VARIANT = os.environ.get("RSQES_VARIANT", "base")


def build(spark, sf_dir, staged):
    d = load_table(spark, sf_dir, "documents")
    spans = (
        spread(d)
        .select(
            "doc_id",
            F.explode(
                chunk_spans(F.col("text"), chunk_size=20, stride=20)
            ).alias("c"),
        )
        .select(
            "doc_id",
            F.col("c.chunk_start").alias("s"),
            F.col("c.chunk_text").alias("chunk"),
        )
        .withColumn("fp", F.md5("chunk"))
    )
    if staged:
        spans = truncate_lineage(spans)
    winners = (
        spans.groupBy("fp")
        .agg(F.min(F.struct("doc_id", "s")).alias("w"))
        .select("fp", F.col("w.doc_id").alias("doc_id"), F.col("w.s").alias("s"))
    )
    kept = spans.join(winners, ["fp", "doc_id", "s"])
    return kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "chunk"))),
                lambda x: x["chunk"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_spans"),
    )


spark = get_spark(app_name="pair-spandedup-r19")
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
df = build(spark, SF, staged)
t1 = time.perf_counter()
df.write.format("noop").mode("overwrite").save()
t2 = time.perf_counter()
print(json.dumps({"variant": VARIANT, "build": round(t1 - t0, 4),
                  "exec": round(t2 - t1, 4), "total": round(t2 - t0, 4)}))
spark.stop()
