"""Measured Spark 4.x feature BOUNDARIES, pinned as tests.

The round-13 pen registers the working side of each of these
surfaces; the registrations' docstrings cite the REJECTED sibling
form as measured fact. These pins keep those claims true across a
Spark upgrade: if a future build starts accepting (or differently
rejecting) a form, the pin fails and the docstring + oracle design
must be revisited — silently changed engine behavior is exactly what
a query registry must not sleep through.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def test_recursive_cte_union_all_works_union_rejected(spark):
    """WITH RECURSIVE: UNION ALL recursion is supported; UNION-dedup
    recursion is rejected (which is why graph_recursive_closure needs
    the DAG + depth-bound termination discipline)."""
    out = spark.sql(
        """
        WITH RECURSIVE r(n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 3
        ) SELECT * FROM r
        """
    ).collect()
    assert sorted(x[0] for x in out) == [1, 2, 3]
    spark.sql(
        "SELECT 1 AS s, 2 AS d"
    ).createOrReplaceTempView("bnd_edges")
    with pytest.raises(AnalysisException) as ei:
        spark.sql(
            """
            WITH RECURSIVE reach(node) AS (
                SELECT 1 UNION
                SELECT e.d FROM reach r JOIN bnd_edges e ON r.node = e.s
            ) SELECT * FROM reach
            """
        ).collect()
    assert "UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE" in str(ei.value)


def test_sql_tvf_parameterized_where_works_limit_rejected(spark):
    """SQL table functions: a parameter may appear in WHERE (the form
    source_sql_table_function registers) but a parameterized LIMIT is
    rejected as unfoldable — while a LATERAL correlated subquery DOES
    allow one (join_lateral_topk's decorrelated form)."""
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION bnd_below(x INT) "
        "RETURNS TABLE(n INT) "
        "RETURN SELECT * FROM VALUES (1),(2),(3) AS t(n) WHERE n < x"
    )
    assert [r[0] for r in spark.sql("SELECT * FROM bnd_below(3)").collect()] == [1, 2]
    with pytest.raises(AnalysisException) as ei:
        spark.sql(
            "CREATE OR REPLACE TEMPORARY FUNCTION bnd_topn(k INT) "
            "RETURNS TABLE(n INT) "
            "RETURN SELECT * FROM VALUES (1),(2),(3) AS t(n) LIMIT k"
        )
    assert "INVALID_LIMIT_LIKE_EXPRESSION" in str(ei.value)


def test_session_window_gap_must_be_calendar_interval(spark):
    """Dynamic session gaps: a STRING gap expression works (the form
    events_session_dynamic_gap registers); a DayTimeIntervalType CASE
    is rejected — Spark requires CalendarIntervalType."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", "a")], "u int, ts string, et string"
    ).select("u", F.col("ts").cast("timestamp").alias("ts"), "et")
    good_gap = F.when(F.col("et") == "a", F.lit("10 minutes")).otherwise(
        F.lit("5 minutes")
    )
    assert (
        df.groupBy("u", F.session_window("ts", good_gap)).count().count() == 1
    )
    bad_gap = F.when(
        F.col("et") == "a", F.expr("INTERVAL 10 MINUTES")
    ).otherwise(F.expr("INTERVAL 5 MINUTES"))
    with pytest.raises(AnalysisException) as ei:
        df.groupBy("u", F.session_window("ts", bad_gap)).count().collect()
    assert "CalendarIntervalType" in str(ei.value)


def test_session_window_exact_boundary_merges(spark):
    """The merge recurrence events_session_dynamic_gap's oracle
    replays: an event at EXACTLY the previous session's end still
    merges (closed boundary — a new session needs ts strictly past
    the max reach)."""
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00")],
        "u int, ts string",
    ).select("u", F.col("ts").cast("timestamp").alias("ts"))
    out = (
        df.groupBy("u", F.session_window("ts", "10 minutes").alias("w"))
        .count()
        .collect()
    )
    assert len(out) == 1 and out[0]["count"] == 2


def test_sql_scripting_while_and_observation_accumulators(spark):
    """SQL scripting (DECLARE/SET/WHILE, last statement = result) and
    the Observation API both behave as the pen registrations assume."""
    out = spark.sql(
        """
        BEGIN
          DECLARE x INT DEFAULT 1;
          WHILE x < 5 DO SET x = x * 2; END WHILE;
          SELECT x AS v;
        END
        """
    ).collect()
    assert out[0]["v"] == 8
    from pyspark.sql import Observation

    obs = Observation("bnd_obs")
    df = spark.range(10).observe(obs, F.count(F.lit(1)).alias("n"))
    df.write.format("noop").mode("overwrite").save()
    assert obs.get["n"] == 10
