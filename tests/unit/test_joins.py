"""Unit tests for the beyond-reference join operators
(operators/joins.py): as-of (backward/forward, unmatched→NULL),
bucketed range join (boundary inclusion/exclusion, band-spanning
buckets), semi/anti.

Exact expected outputs on tiny in-memory frames — the reference's
test discipline (SURVEY §5) with real asserts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rs_query_engine_spark.operators.joins import (
    anti_join,
    asof_join,
    range_join_bands,
    semi_join,
)


def _quotes(spark):
    return spark.createDataFrame(
        [
            ("A", 1, 10.0),
            ("A", 5, 11.0),
            ("A", 9, 12.0),
            ("B", 4, 20.0),
        ],
        "sym string, qts int, px double",
    )


def _trades(spark):
    return spark.createDataFrame(
        [
            ("A", 0, 100),  # before any quote → NULL (backward)
            ("A", 5, 101),  # exactly at quote ts → inclusive match
            ("A", 7, 102),  # between quotes → earlier one
            ("B", 9, 103),  # after B's only quote
            ("C", 3, 104),  # key with no quotes at all → NULL
        ],
        "sym string, tts int, tid int",
    )


def test_asof_backward(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), by=["sym"], left_ts="tts", right_ts="qts"
    )
    got = {r["tid"]: (r["qts"], r["px"]) for r in out.collect()}
    assert got == {
        100: (None, None),
        101: (5, 11.0),
        102: (5, 11.0),
        103: (4, 20.0),
        104: (None, None),
    }


def test_asof_forward(spark):
    out = asof_join(
        _trades(spark),
        _quotes(spark),
        by=["sym"],
        left_ts="tts",
        right_ts="qts",
        direction="forward",
    )
    got = {r["tid"]: (r["qts"], r["px"]) for r in out.collect()}
    assert got == {
        100: (1, 10.0),  # nearest at-or-after
        101: (5, 11.0),  # inclusive
        102: (9, 12.0),
        103: (None, None),  # nothing after
        104: (None, None),
    }


def test_asof_keeps_all_left_columns(spark):
    out = asof_join(
        _trades(spark), _quotes(spark), by=["sym"], left_ts="tts", right_ts="qts"
    )
    assert set(out.columns) == {"sym", "tts", "tid", "qts", "px"}
    assert out.count() == 5


def test_range_join_bands_boundaries(spark):
    facts = spark.createDataFrame(
        [(0.0,), (9.99,), (10.0,), (24.9,), (25.0,), (99.9,), (100.0,), (-1.0,)],
        "v double",
    )
    bands = spark.createDataFrame(
        [("lo", 0.0, 10.0), ("mid", 10.0, 25.0), ("hi", 25.0, 100.0)],
        "band string, lo double, hi double",
    )
    out = range_join_bands(facts, bands, "v", "lo", "hi", bucket_width=7.0)
    got = sorted((r["v"], r["band"]) for r in out.collect())
    # half-open [lo, hi): 10.0→mid not lo; 100.0 and -1.0 unmatched
    assert got == [
        (0.0, "lo"),
        (9.99, "lo"),
        (10.0, "mid"),
        (24.9, "mid"),
        (25.0, "hi"),
        (99.9, "hi"),
    ]


def test_semi_anti(spark):
    left = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    right = spark.createDataFrame([(1,), (1,), (3,)], "k int")
    assert sorted(r["v"] for r in semi_join(left, right, ["k"]).collect()) == ["x", "z"]
    assert [r["v"] for r in anti_join(left, right, ["k"]).collect()] == ["y"]
    # semi never duplicates left rows on multi-match
    assert semi_join(left, right, ["k"]).count() == 2


def test_asof_cogrouped_matches_jvm(spark):
    from rs_query_engine_spark.operators.joins import asof_join_cogrouped

    for direction in ("backward", "forward"):
        jvm = asof_join(
            _trades(spark), _quotes(spark), by=["sym"], left_ts="tts",
            right_ts="qts", direction=direction,
        )
        py = asof_join_cogrouped(
            _trades(spark), _quotes(spark), by=["sym"], left_ts="tts",
            right_ts="qts", direction=direction,
        )
        def norm(df):
            return sorted((r["tid"], r["qts"], r["px"]) for r in df.collect())
        assert norm(py) == norm(jvm), direction


def test_asof_reserved_name_collision_guarded(spark):
    # a caller frame already containing an internal working name must
    # fail fast with a clear error, not silently produce wrong results
    import pytest

    from rs_query_engine_spark.operators.joins import asof_join_nearest

    bad = _trades(spark).withColumn("_side", F.lit(1))
    with pytest.raises(ValueError, match="_side"):
        asof_join(bad, _quotes(spark), by=["sym"], left_ts="tts", right_ts="qts")
    with pytest.raises(ValueError, match="_side"):
        asof_join_nearest(
            _trades(spark), _quotes(spark).withColumn("_side", F.lit(0)),
            by=["sym"], left_ts="tts", right_ts="qts", tolerance_us=1,
        )
