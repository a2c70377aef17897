#!/usr/bin/env python
"""Paired A/B for embedding_lsh_pairs' verify-join attach (r19).

BASE: cand = b.join(a.join(pairs, "id_a"), "id_b") — planner picks the
build side from estimates (initial plan broadcasts the full-vector
corpus sides).
WIN : broadcast the candidate PAIR set and the (pairs ⋈ a) result —
guide §8: decide with small rows, never broadcast/shuffle the payload
side.

RSQES_VARIANT=base|win; RSQES_CHECK=1 compares rows at 3 SFs.
"""
import gc
import json
import os
import sys
import time

from pyspark.sql import functions as F

import rs_query_engine_spark.operators.dedup as dd
from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES, load_table

SF = os.environ.get("SF", "/root/testdata/sf0.1")
VARIANT = os.environ.get("RSQES_VARIANT", "base")
CHECK = os.environ.get("RSQES_CHECK") == "1"


def build(spark, sf_dir, variant):
    from rs_query_engine_spark.operators.similarity import dot, norm_sq
    from rs_query_engine_spark.sources.corpus import spread
    from rs_query_engine_spark.session import truncate_lineage

    df = load_table(spark, sf_dir, "embeddings")
    id_col, vec_col = "vec_id", "embedding"
    dim, num_planes, bands, threshold, max_bucket = 64, 32, 8, 0.4, 1000
    planes = dd.hyperplane_signs(num_planes, dim)
    rows = num_planes // bands
    v = F.col(vec_col).cast("array<double>")
    base = spread(df).select(
        F.col(id_col).alias("_id"), v.alias("_v"), F.sqrt(norm_sq(v)).alias("_n")
    )
    plane_lits = ",".join(
        "array(" + ",".join("1.0D" if x > 0 else "-1.0D" for x in planes[i]) + ")"
        for i in range(num_planes)
    )
    dots = F.expr(
        f"transform(array({plane_lits}), p -> "
        "aggregate(zip_with(_v, p, (x, y) -> x * y), "
        "0.0D, (acc, x) -> acc + x))"
    )
    band_keys = [
        F.expr(
            " + ".join(
                f"(CASE WHEN element_at(_d, {b * rows + r + 1}) >= 0.0D "
                f"THEN {1 << r} ELSE 0 END)"
                for r in range(rows)
            )
        ).alias(f"_k{b}")
        for b in range(bands)
    ]
    banded = (
        base.select("_id", dots.alias("_d"))
        .select("_id", *band_keys)
        .select(
            "_id",
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(b).alias("band"), F.col(f"_k{b}").alias("key"))
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("_id", "bk.band", "bk.key")
        .transform(truncate_lineage)
    )
    sizes = banded.groupBy("band", "key").count()
    ok = banded.join(
        F.broadcast(sizes.filter(F.col("count").between(2, max_bucket))),
        ["band", "key"],
    )
    pa = ok.select("band", "key", F.col("_id").alias("id_a"))
    pb = ok.select("band", "key", F.col("_id").alias("id_b"))
    pairs = (
        pa.join(
            pb,
            (pa["band"] == pb["band"])
            & (pa["key"] == pb["key"])
            & (pa["id_a"] < pb["id_b"]),
        )
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    a = base.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na")
    )
    b = base.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb")
    )
    if variant == "base":
        cand = b.join(a.join(pairs, "id_a"), "id_b")
    else:
        cand = b.join(F.broadcast(a.join(F.broadcast(pairs), "id_a")), "id_b")
    cos = F.try_divide(dot(F.col("_va"), F.col("_vb")), F.col("_na") * F.col("_nb"))
    return cand.select("id_a", "id_b", cos.alias("cos")).filter(
        F.col("cos") >= threshold
    )


spark = get_spark(app_name=f"pair-embcos-{VARIANT}")
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
