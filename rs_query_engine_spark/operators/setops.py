"""Set operations (beyond-reference: SURVEY §2.6 / §7 M2.1).

SQL bag/set semantics mapping:
- ``union``        → SQL UNION (distinct) = ``unionByName`` + ``distinct``
- ``union_all``    → SQL UNION ALL = ``unionByName``
- ``intersect``    → SQL INTERSECT (distinct), Spark ``intersect``
- ``except_``      → SQL EXCEPT (distinct), Spark ``exceptAll`` minus
  duplicates → use ``subtract`` (distinct semantics)

All are shuffles on the full row; at scale prefer semi/anti joins on a
key when the intent is key membership (Catalyst can't infer that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def union(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b).distinct()


def union_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.unionByName(b)


def intersect(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def intersect_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersectAll(b)


def except_(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.subtract(b)


def except_all(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.exceptAll(b)


def union_by_name(
    a: DataFrame, b: DataFrame, allow_missing_columns: bool = True
) -> DataFrame:
    """Schema-evolution-safe union: columns matched by NAME, not
    position; columns absent on one side become NULL when
    ``allow_missing_columns``. This is the append operation for
    heterogeneous batch drops (an upstream added a field last week) —
    positional ``UNION ALL`` silently misaligns them."""
    return a.unionByName(b, allowMissingColumns=allow_missing_columns)


def upsert_latest(
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    version_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Merge/upsert: union base with an update batch and keep ONE row
    per key — the highest ``version_col`` (ties broken by
    ``tiebreak_col``, which defaults to preferring updates if it is
    NULL-free there) — the CDC-compaction idiom without a mutable
    table format. One shuffle on the key (union is free); no driver
    loop, no per-row merge. At scale, partition/bucket both sides by
    the key so repeated merges reuse the layout."""
    from pyspark.sql import Window

    tagged = base.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    order = [F.col(version_col).desc(), F.col("_src").desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )
