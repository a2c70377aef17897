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
