"""Unit tests for the Engine/Frame/Catalog facade — mirrors the
reference's operator unit tests (SURVEY §5) with real asserts, over an
in-memory copy of the reference's golden `test`/`salary` CSV fixtures
(FIXTURES.md §A; values from ``/root/reference/data``'s schema shape,
re-synthesized — not copied)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rs_query_engine_spark import Engine, col, lit
from rs_query_engine_spark.catalog import NoSuchTableError
from rs_query_engine_spark.operators.aggregates import avg, count, max_, min_, sum_

TEST_ROWS = [
    (1, "alpha", 24, 0.0),
    (2, "bravo", 24, 100.0),
    (3, "charlie", 18, 99.99),
    (4, "delta", 18, 99.98),
    (5, "echo", 26, 99.97),
]
TEST_SCHEMA = "id long, name string, age long, score double"

SALARY_ROWS = [
    (1, "alpha", 2000, 0),
    (2, "bravo", 50000, 5),
    (3, "charlie", 30000, 6),
    (4, "delta", 20000, 7),
    (5, "foxtrot", 10000, 8),
]
SALARY_SCHEMA = "id long, name string, salary long, awards long"


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark)
    e.catalog.register_memory("test", TEST_ROWS, TEST_SCHEMA)
    e.catalog.register_memory("salary", SALARY_ROWS, SALARY_SCHEMA)
    return e


def test_catalog_lookup(eng):
    assert "test" in eng.catalog
    assert eng.catalog.table_names() == ["salary", "test"]
    with pytest.raises(NoSuchTableError):
        eng.catalog.table("nope")


def test_scan(eng):
    # mirrors scan test src/physical_plan/scan.rs:44-76
    rows = eng.table("test").collect()
    assert [r.id for r in rows] == [1, 2, 3, 4, 5]


def test_projection_with_arithmetic(eng):
    # mirrors src/physical_plan/projection.rs:79-120 (col, col+lit)
    out = (
        eng.table("test")
        .project(col("id"), (col("age") + lit(1)).alias("age1"))
        .collect()
    )
    assert [(r.id, r.age1) for r in out] == [(1, 25), (2, 25), (3, 19), (4, 19), (5, 27)]


def test_filter(eng):
    # mirrors src/physical_plan/selection.rs:119-168 (age == 24 filter)
    out = eng.table("test").filter(col("age") == 24).project("name").collect()
    assert sorted(r.name for r in out) == ["alpha", "bravo"]


def test_filter_null_predicate_drops_row(eng):
    # SQL semantics: NULL predicate drops the row (the reference's
    # selection appends a null row instead — selection.rs:45; not copied)
    df = eng.spark.createDataFrame([(1, 10), (2, None)], "id long, v long")
    out = df.filter(F.col("v") > 5).collect()
    assert [r.id for r in out] == [1]


def test_aggregate_grouped(eng):
    # mirrors src/physical_plan/aggr/mod.rs:264-296 — group by computed
    # bool (age <= 24), MAX/MIN/COUNT/AVG/SUM over score — real asserts
    out = (
        eng.table("test")
        .aggregate(
            (col("age") <= 24).alias("young"),
            [
                max_("score", "mx"),
                min_("score", "mn"),
                count("score", "cnt"),
                avg("age", "avg_age"),
                sum_("id", "sum_id"),
            ],
        )
        .collect()
    )
    got = {r.young: r for r in out}
    assert got[True].mx == 100.0 and got[True].mn == 0.0 and got[True].cnt == 4
    assert got[True].sum_id == 10 and got[True].avg_age == 21.0
    assert got[False].cnt == 1 and got[False].mx == 99.97


def test_aggregate_null_group_key_kept(eng):
    # SQL semantics: NULL group keys form a group (reference drops them,
    # aggr/mod.rs:61-62)
    df = eng.spark.createDataFrame([("a", 1), (None, 2), (None, 3)], "k string, v long")
    from rs_query_engine_spark.engine import Frame

    out = {r.k: r.s for r in Frame(df).aggregate("k", [sum_("v", "s")]).collect()}
    assert out == {"a": 1, None: 5}


def test_join_two_keys(eng):
    # mirrors the reference's two-key join test
    # (src/physical_plan/nested_loop_join.rs:202-248) — with correct
    # SQL inner-join semantics: only (id, name) pairs present in BOTH
    out = (
        eng.table("test")
        .join(eng.table("salary"), (["id", "name"], ["id", "name"]))
        .project("salary")
        .collect()
    )
    assert sorted(r.salary for r in out) == [2000, 20000, 30000, 50000]


def test_join_mismatched_key_lists_raise(eng):
    # data_frame.rs:79-84: differing key-list lengths are an error
    with pytest.raises(ValueError):
        eng.table("test").join(eng.table("salary"), (["id"], ["id", "name"]))


def test_join_left_right(eng):
    left = (
        eng.table("salary")
        .join(eng.table("test"), (["name"], ["name"]), how="left")
        .collect()
    )
    assert len(left) == 5  # 'foxtrot' survives with null right side
    unmatched = [r for r in left if r.name == "foxtrot"]
    assert len(unmatched) == 1 and unmatched[0].age is None


def test_sql_entry_point(eng):
    out = eng.sql("SELECT count(*) AS n FROM test WHERE age >= 24").collect()
    assert out[0].n == 3


def test_explain_facade(eng):
    s = eng.table("test").filter(col("age") > 20).explain_str()
    assert "Filter" in s or "filter" in s
