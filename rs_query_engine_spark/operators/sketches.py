"""Mergeable frequency sketches: Count-Min (Cormode & Muthukrishnan,
2005).

The Count-Min sketch is the 100-TB frequency-estimation pattern: a
``depth × width`` grid of counters where occurrence of item t
increments cell ``(j, h_j(t))`` for each of ``depth`` independent hash
rows, and the estimate for t is ``min_j grid[j][h_j(t)]`` — an
OVERESTIMATE by construction (collisions only add), with error ≤
εN at probability 1−δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉. The grid is a
trivially mergeable partial aggregate (cell-wise +), so partial
sketches roll up across partitions / days / sources without
re-scanning raw data — same operational shape as the HLL rollup in
``queries.agg_hll_sketch_merge``.

Unlike probabilistic-seed sketches, everything here is DETERMINISTIC
md5 bucketing, so an oracle engine building the same grid gets the
bit-identical sketch — estimates are hash-verifiable cross-engine, not
just error-bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_bucket(row: int, item: Column, width: int) -> Column:
    """Hash row ``row``'s bucket for ``item``: first 8 hex chars of
    md5("{row}|" + item) mod width — engine-portable (DuckDB:
    ``('0x'||substr(md5(row||'|'||item),1,8))::BIGINT % width``)."""
    from rs_query_engine_spark.functions.hashing import md5_bucket

    return md5_bucket(F.concat(F.lit(f"{row}|"), item), width)


def countmin_sketch(
    items: DataFrame, item_col: str, depth: int = 3, width: int = 64
) -> DataFrame:
    """Build the Count-Min grid over one occurrence per input row:
    → (row, bucket, c). One explode (depth entries per occurrence) and
    one hash aggregate — the partial grids combine map-side, so the
    shuffle carries at most ``depth × width`` rows per task regardless
    of input size. The output frame IS the mergeable sketch: union two
    of them and re-aggregate cell-wise to merge."""
    cells = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        cm_bucket(j, F.col(item_col), width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_c")
    ).select("_c.row", "_c.bucket")
    return cells.groupBy("row", "bucket").agg(F.count(F.lit(1)).alias("c"))


def countmin_sketch_from_counts(
    freqs: DataFrame,
    item_col: str,
    count_col: str,
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Build the identical Count-Min grid from PRE-AGGREGATED term
    frequencies instead of the raw occurrence stream: cell (j, h_j(t))
    accumulates Σ count(t) — exactly the grid
    :func:`countmin_sketch` produces, since addition is associative
    over the per-item occurrence counts.

    Use this when a term-frequency aggregate already exists (as in
    verification pipelines that compute exact counts anyway): the
    explode runs over |vocab| rows instead of N occurrences, so the
    sketch build costs vocabulary-size work after one shared
    aggregation. The pure streaming form (:func:`countmin_sketch`)
    remains the one-pass/mergeable path when no aggregate exists."""
    cells = freqs.select(
        F.col(count_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        cm_bucket(j, F.col(item_col), width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_c"),
    ).select("_c.row", "_c.bucket", count_col)
    return cells.groupBy("row", "bucket").agg(F.sum(count_col).alias("c"))


def countmin_estimate(
    sketch: DataFrame, probes: DataFrame, item_col: str, depth: int = 3, width: int = 64
) -> DataFrame:
    """Estimate each probe item's frequency from the grid:
    ``min_j c[j, h_j(item)]`` → (item_col, cm_est).

    The probe side re-derives its ``depth`` buckets (same md5 — no
    state shared with the build side beyond the grid itself) and
    equi-joins the sketch on (row, bucket). The sketch is at most
    ``depth × width`` rows — broadcast — so estimation is map-only
    over the probes."""
    keyed = probes.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        cm_bucket(j, F.col(item_col), width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("_c"),
    ).select(item_col, "_c.row", "_c.bucket")
    return (
        keyed.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy(item_col)
        .agg(F.min("c").alias("cm_est"))
    )
