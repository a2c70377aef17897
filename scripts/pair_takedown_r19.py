#!/usr/bin/env python
"""Interleaved A/B for governance_takedown_audit's ANN arm (r19):
BASE (two full probe_ivf_index pipelines — before + tombstone-honoring
after) vs STAGED (score_ivf_probe once, localCheckpoint, rank twice —
the after arm anti-joins tombstones on the staged scored frame, which
commutes with row-wise scoring).

One fresh-session timed run per invocation of the WHOLE query (bench
shape: warm at sf0.001, noop-sink timed at $SF). RSQES_VARIANT=staged
selects the variant. RSQES_CHECK=1 collects both spellings at 3 SFs
and compares sorted rows.
"""
import gc
import json
import os
import time

from pyspark.sql import functions as F

from rs_query_engine_spark.operators.ivf_index import (
    ensure_ivf_index,
    ensure_ivf_tombstones,
    probe_ivf_index,
    rank_ivf_topk,
    read_ivf_tombstones,
    score_ivf_probe,
)
from rs_query_engine_spark.operators.lsh_index import (
    ensure_compacted_lsh_index,
    ensure_lsh_index,
    ensure_lsh_tombstones,
    read_index_bands,
    read_tombstones,
)
from rs_query_engine_spark.session import get_spark, truncate_lineage
from rs_query_engine_spark.sources.corpus import TABLES, load_table

SF = os.environ.get("SF", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
VARIANT = os.environ.get("RSQES_VARIANT", "base")


def build(spark, sf_dir, staged):
    zero = F.lit(0).cast("bigint")
    tombs_d = read_tombstones(spark, ensure_lsh_tombstones(spark, sf_dir))
    bands_base = read_index_bands(spark, ensure_lsh_index(spark, sf_dir))
    bands_comp = read_index_bands(
        spark, ensure_compacted_lsh_index(spark, sf_dir)
    )
    lsh_before = bands_base.join(F.broadcast(tombs_d), "doc_id").groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("_b"))
    lsh_after = bands_comp.join(F.broadcast(tombs_d), "doc_id").groupBy(
        "doc_id"
    ).agg(F.count(F.lit(1)).alias("_a"))
    lsh = (
        tombs_d.join(lsh_before, "doc_id", "left")
        .join(lsh_after, "doc_id", "left")
        .select(
            F.lit("lsh_postings").alias("surface"),
            F.col("doc_id").alias("id"),
            F.coalesce(F.col("_b"), zero).alias("before_cnt"),
            F.coalesce(F.col("_a"), zero).alias("after_cnt"),
        )
    )
    root = ensure_ivf_index(spark, sf_dir)
    tombs_v = read_ivf_tombstones(spark, ensure_ivf_tombstones(spark, sf_dir))
    q = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") % 100 == 0
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    if staged:
        scored = truncate_lineage(score_ivf_probe(spark, root, q, nprobe=2))
        res_before = rank_ivf_topk(scored, 10)
        res_after = rank_ivf_topk(
            scored.join(tombs_v.select("vec_id"), "vec_id", "left_anti"), 10
        )
    else:
        res_before = probe_ivf_index(spark, root, q, 10, nprobe=2)
        res_after = probe_ivf_index(
            spark, root, q, 10, nprobe=2, tombstones=tombs_v
        )
    ann_before = res_before.join(F.broadcast(tombs_v), "vec_id").groupBy(
        "vec_id"
    ).agg(F.count(F.lit(1)).alias("_b"))
    ann_after = res_after.join(F.broadcast(tombs_v), "vec_id").groupBy(
        "vec_id"
    ).agg(F.count(F.lit(1)).alias("_a"))
    ann = (
        tombs_v.join(ann_before, "vec_id", "left")
        .join(ann_after, "vec_id", "left")
        .select(
            F.lit("ann_topk").alias("surface"),
            F.col("vec_id").alias("id"),
            F.coalesce(F.col("_b"), zero).alias("before_cnt"),
            F.coalesce(F.col("_a"), zero).alias("after_cnt"),
        )
    )
    return lsh.unionByName(ann)


spark = get_spark(app_name="pair-takedown-r19")
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
