"""Edge-case pins for the maintained rollup (operators/ivm.py) that
the corpus SFs never exercise: a group whose rows are ALL retracted
must vanish from the view (net-zero drop), and partial merge must be
exact across an arbitrary split of the input."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from rs_query_engine_spark.operators.ivm import D_VAL, day_partials

ROWS = [
    # (ts, event_type, value, user_id)
    (datetime(2024, 1, 1, 5), "click", 1.25, 7),
    (datetime(2024, 1, 1, 9), "click", 2.50, 38),  # 38 % 31 == 7
    (datetime(2024, 1, 1, 12), "view", 0.75, 2),
    (datetime(2024, 1, 2, 1), "click", 4.00, 3),
    (datetime(2024, 1, 2, 2), "click", 8.00, 3),
]
SCHEMA = "ts timestamp, event_type string, value double, user_id bigint"


def _merge(*parts):
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("day", "event_type")
        .agg(
            F.sum("cnt").alias("n_events"),
            F.sum("val_sum").cast("double").alias("total_value"),
        )
        .filter(F.col("n_events") > 0)
    )


def test_fully_erased_group_drops(spark):
    """Jan-1 'click' has ONLY victim rows (user 7 and 38 — both
    ``% 31 == 7``); retraction must remove the group entirely, not
    leave an n_events=0 husk (or worse, a negative count)."""
    ev = spark.createDataFrame(ROWS, SCHEMA)
    full = day_partials(ev)
    victims = day_partials(ev.filter(F.col("user_id") % 31 == 7)).select(
        "day",
        "event_type",
        (-F.col("cnt")).alias("cnt"),
        (-F.col("val_sum")).alias("val_sum"),
    )
    got = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _merge(full, victims).collect()
    }
    assert (datetime(2024, 1, 1), "click") not in got
    assert got[(datetime(2024, 1, 1), "view")] == (1, 0.75)
    assert got[(datetime(2024, 1, 2), "click")] == (2, 12.00)


def test_partial_merge_equals_direct(spark):
    """Any split of the input re-reduces to the direct aggregate —
    the monoid property the artifact design rests on. Split by an
    arbitrary non-temporal predicate to prove order independence."""
    ev = spark.createDataFrame(ROWS, SCHEMA)
    left = day_partials(ev.filter(F.col("user_id") % 2 == 0))
    right = day_partials(ev.filter(F.col("user_id") % 2 != 0))
    merged = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _merge(left, right).collect()
    }
    direct = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _merge(day_partials(ev)).collect()
    }
    assert merged == direct


def test_retraction_is_decimal_exact(spark):
    """The inverse leg must cancel bit-for-bit: retracting every row
    of a group leaves EXACTLY zero in the decimal sum (a double sum
    could leave 1-ulp residue and a phantom group)."""
    ev = spark.createDataFrame(ROWS, SCHEMA)
    full = day_partials(ev)
    anti = day_partials(ev).select(
        "day",
        "event_type",
        (-F.col("cnt")).alias("cnt"),
        (-F.col("val_sum")).alias("val_sum"),
    )
    residue = (
        full.unionByName(anti)
        .groupBy("day", "event_type")
        .agg(F.sum("val_sum").alias("s"), F.sum("cnt").alias("c"))
        .filter((F.col("s") != F.lit(0).cast(D_VAL)) | (F.col("c") != 0))
    )
    assert residue.count() == 0


def test_refresh_against_merged_generation_is_exact(spark):
    """The merged generation's recorded cutoff must sit PAST every
    absorbed row: a refresh run against it (partials plus
    ``ts >= cutoff`` delta) must equal the direct aggregate. With a
    cutoff recorded AT the corpus max, the boundary row would land in
    both the merged partials and the delta and double-count —
    the regression this pins."""
    import duckdb

    from rs_query_engine_spark.operators.ivm import (
        day_partials,
        ensure_merged_rollup_partials,
        read_rollup_cutoff,
        read_rollup_partials,
    )
    from rs_query_engine_spark.sources.corpus import load_table

    sf_dir = "/root/testdata/sf0.001"
    root = ensure_merged_rollup_partials(spark, sf_dir)
    cutoff = read_rollup_cutoff(spark, root)
    ev = load_table(spark, sf_dir, "events")
    delta = ev.filter(F.col("ts") >= F.lit(cutoff))
    # the merge absorbed everything — the next delta must be empty
    assert delta.count() == 0
    refreshed = {
        (r["day"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in _merge(
            read_rollup_partials(spark, root), day_partials(delta)
        ).collect()
    }
    direct = duckdb.sql(
        f"""
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) d,
               event_type, COUNT(*) n,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) tv
        FROM read_parquet('{sf_dir}/events.parquet') GROUP BY 1, 2
        """
    ).fetchall()
    assert refreshed == {(d, t): (n, tv) for d, t, n, tv in direct}
