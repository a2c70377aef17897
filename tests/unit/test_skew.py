"""Salted-operator tests: results must equal the unsalted equivalents
exactly (salting only reshapes the shuffle), and the salted aggregate
plan must show the two-phase groupBy."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rs_query_engine_spark.operators.skew import salted_aggregate, salted_join
from rs_query_engine_spark.plans.explain import explain_str


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows) + a tail
    rows = [(i, "hot" if i % 10 else f"k{i}", float(i % 7)) for i in range(1000)]
    return spark.createDataFrame(rows, "uid bigint, k string, v double")


def test_salted_aggregate_matches_plain(spark, skewed):
    got = salted_aggregate(
        skewed,
        keys=["k"],
        aggs={
            "total": ("sum", "v"),
            "n": ("count", "v"),
            "lo": ("min", "v"),
            "hi": ("max", "v"),
        },
        uniquifier=["uid"],
        num_salts=8,
    )
    want = skewed.groupBy("k").agg(
        F.sum("v").alias("total"),
        F.count("v").alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_salted_aggregate_rejects_nonalgebraic(skewed):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_aggregate(
            skewed, ["k"], {"m": ("median", "v")}, uniquifier=["uid"]
        )


def test_salted_aggregate_two_phase_plan(spark, skewed):
    got = salted_aggregate(
        skewed, ["k"], {"total": ("sum", "v")}, uniquifier=["uid"], num_salts=8
    )
    plan = explain_str(got)
    # two logical groupBys → ≥2 exchanges/aggregate pairs in the plan
    assert plan.count("HashAggregate") >= 3  # partial+final for each phase


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("k3", "T3"), ("k13", "T13"), ("missing", "X")],
        "k string, label string",
    )
    got = salted_join(skewed, dim, ["k"], probe_uniquifier=["uid"], num_salts=4)
    want = skewed.join(dim, ["k"])
    assert got.count() == want.count()
    assert sorted(map(tuple, got.select("uid", "label").collect())) == sorted(
        map(tuple, want.select("uid", "label").collect())
    )


def test_salted_join_left(spark, skewed):
    dim = spark.createDataFrame([("hot", "H")], "k string, label string")
    got = salted_join(skewed, dim, ["k"], probe_uniquifier=["uid"], num_salts=4, how="left")
    want = skewed.join(dim, ["k"], "left")
    assert got.count() == want.count() == 1000
    assert (
        got.filter(F.col("label").isNull()).count()
        == want.filter(F.col("label").isNull()).count()
    )
