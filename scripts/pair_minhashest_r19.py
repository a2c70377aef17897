#!/usr/bin/env python
"""Interleaved A/B for dedup_minhash_estimate (r19): the size-filter
below vs above the checkpoint (pushed-filter dup-eval during the one
materialization pass). RSQES_VARIANT=after selects the fixed spelling;
RSQES_CHECK=1 compares sorted rows at 3 SFs.
"""
import gc
import json
import os
import time

from pyspark.sql import functions as F

from rs_query_engine_spark.functions.text import shingles
from rs_query_engine_spark.operators.dedup import (
    MINHASH_NUM_HASHES,
    _minhash_from_shingles,
    banded_candidate_pairs,
    minhash_band_keys,
)
from rs_query_engine_spark.session import get_spark, truncate_lineage
from rs_query_engine_spark.sources.corpus import TABLES, load_table, spread

SF = os.environ.get("SF", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"
VARIANT = os.environ.get("RSQES_VARIANT", "base")
K = MINHASH_NUM_HASHES


def build(spark, sf_dir, filter_after):
    d = load_table(spark, sf_dir, "documents")
    base = spread(d).select(
        F.col("doc_id").alias("_id"),
        F.array_distinct(shingles(F.col("text"), 3)).alias("_sh"),
    )
    if filter_after:
        base = (
            base.select(
                "_id", "_sh", _minhash_from_shingles(F.col("_sh"), K).alias("_sig")
            )
            .transform(truncate_lineage)
            .filter(F.size("_sh") > 0)
        )
    else:
        base = (
            base.filter(F.size("_sh") > 0)
            .select(
                "_id", "_sh", _minhash_from_shingles(F.col("_sh"), K).alias("_sig")
            )
            .transform(truncate_lineage)
        )
    banded = base.select(
        "_id", F.explode(minhash_band_keys(F.col("_sig"))).alias("bk")
    ).select("_id", "bk.band", "bk.key")
    pairs = banded_candidate_pairs(banded)
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_sh").alias("sh_a"),
        F.col("_sig").alias("sig_a"),
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_sh").alias("sh_b"),
        F.col("_sig").alias("sig_b"),
    )
    cand = b.join(a.join(pairs, "id_a"), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter.cast("double") / (F.size("sh_a") + F.size("sh_b") - inter)
    matches = F.size(
        F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda m: m)
    )
    est = matches / F.lit(float(K))
    return cand.select(
        "id_a", "id_b", jac.alias("jaccard"), est.alias("est_jaccard"),
        (est - jac).alias("err"),
    )


spark = get_spark(app_name="pair-minhashest-r19")
for t in TABLES:
    load_table(spark, SF, t).count()

if os.environ.get("RSQES_CHECK"):
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", SF):
        a = sorted(map(repr, (tuple(r) for r in build(spark, sf, False).collect())))
        b = sorted(map(repr, (tuple(r) for r in build(spark, sf, True).collect())))
        print(sf.rsplit("/", 1)[-1], "rows", len(a), "identical", a == b)
    spark.stop()
    raise SystemExit

filter_after = VARIANT == "after"
build(spark, WARM, filter_after).write.format("noop").mode("overwrite").save()
gc.collect()
t0 = time.perf_counter()
build(spark, SF, filter_after).write.format("noop").mode("overwrite").save()
print(json.dumps({"variant": VARIANT,
                  "minhash_estimate": round(time.perf_counter() - t0, 4)}))
spark.stop()
