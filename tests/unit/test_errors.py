"""Error-taxonomy tests: the engine surfaces the reference's error
granularity (``src/error.rs:5-14``) as typed Python exceptions instead
of raw AnalysisExceptions."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from rs_query_engine_spark.engine import Engine, Frame
from rs_query_engine_spark.errors import (
    NoSuchColumnError,
    NoSuchTableError,
    TypeMismatchError,
)


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark)
    e.catalog.register_memory(
        "people", [(1, "ann", 24), (2, "bo", 30)], "id long, name string, age long"
    )
    return e


def test_no_such_table(eng):
    with pytest.raises(NoSuchTableError):
        eng.table("nonexistent")


def test_no_such_column_in_project(eng):
    with pytest.raises(NoSuchColumnError):
        eng.table("people").project("id", "salary")


def test_no_such_column_in_filter(eng):
    with pytest.raises(NoSuchColumnError):
        eng.table("people").filter(F.col("salary") > 10)


def test_type_mismatch(eng):
    # array function over a scalar column → DATATYPE_MISMATCH
    with pytest.raises(TypeMismatchError):
        eng.table("people").project(F.array_min(F.col("age")).alias("x"))


def test_join_key_length_mismatch(eng):
    # data_frame.rs:79-84: mismatched key lists are a build-time error
    left = eng.table("people")
    with pytest.raises(ValueError, match="differ in length"):
        left.join(left, on=(["id"], ["id", "name"]))


def test_frame_ops_still_work(eng):
    out = (
        eng.table("people")
        .filter(F.col("age") > 25)
        .project("name")
        .collect()
    )
    assert [r["name"] for r in out] == ["bo"]
