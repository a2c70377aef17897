"""Data-layout operators: space-filling-curve (Z-order) clustering.

At 100 TB the dominant cost of most queries is the SCAN, and the scan
cost is governed by data layout: parquet row-group min/max statistics
prune row groups only when the values in each file span a NARROW
range. Sorting clusters one column perfectly and every other column
not at all; interleaving the bits of several columns into a single
Z-value and range-partitioning by it bounds the per-file range of
EVERY participating column simultaneously — the multi-dimensional
clustering trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY``.

Everything here is exact integer bit arithmetic (shifts, masks,
addition of disjoint bit terms), identical in Spark and DuckDB, so the
layout decision is hash-verifiable cross-engine — no library, no
approximation. Map-only until the final per-file statistics
aggregation (one hash aggregate with map-side partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single Z-value (Morton code): bit i of ``x`` lands
    at position 2i, bit i of ``y`` at 2i+1. Adjacent Z-values differ
    in few low-order bits of BOTH inputs, so range-partitioning the
    Z-value co-locates rows that are close in (x, y) space.

    Pure bit arithmetic — ``(x >> i) & 1 << 2i`` terms summed (the
    terms occupy disjoint bit positions, so ``+`` is exactly ``|``,
    and addition is what both engines fold constant-exactly). Stays
    inside whole-stage codegen; no shuffle, no UDF."""
    xb = x.cast("bigint")
    yb = y.cast("bigint")
    term = None
    for i in range(bits):
        tx = F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ty = F.shiftleft(F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = tx + ty if term is None else term + tx + ty
    return term


def zorder_key_sql(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB expression computing the identical Morton code —
    generated from the same loop so the two engines cannot drift."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_file_stats(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 8,
    file_shift: int = 8,
) -> DataFrame:
    """Simulate a Z-order rewrite and measure its pruning power:
    assign each row to a target file by the high bits of its Z-value
    (``file_id = z >> file_shift`` — a range partitioning of the
    curve), then emit per-file row counts and min/max of BOTH
    dimensions.

    The min/max spans ARE the parquet footer statistics a scan would
    prune on: narrow spans in both columns ⇒ a predicate on either
    column skips most files. In production the same Z-value feeds
    ``df.repartitionByRange(n, z).sortWithinPartitions(z)`` before the
    parquet write; here the per-file stats are the measurable,
    hash-verifiable artifact of that layout decision."""
    z = zorder_key(x, y, bits)
    return (
        df.select(x.alias("_x"), y.alias("_y"), z.alias("_z"))
        .groupBy(F.shiftright(F.col("_z"), file_shift).alias("file_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("min_x"),
            F.max("_x").alias("max_x"),
            F.min("_y").alias("min_y"),
            F.max("_y").alias("max_y"),
        )
    )
