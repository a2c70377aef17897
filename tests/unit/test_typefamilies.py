"""Pins for the shared type-family mapping that both the oracle
parity tests and the drive_pen.py pre-flip gate rely on (the driver
hash is TYPE-sensitive — CLAUDE.md). A drift here silently weakens
the pre-flip gate, so the coarse families are pinned directly."""

import pyarrow as pa

from rs_query_engine_spark.typefamilies import arrow_family, spark_family


def test_spark_integer_widths_collapse():
    assert {spark_family(s) for s in ("tinyint", "smallint", "int", "bigint")} == {"int"}


def test_arrow_integer_widths_and_signs_collapse():
    assert {
        arrow_family(t)
        for t in (pa.int8(), pa.int32(), pa.int64(), pa.uint64())
    } == {"int"}


def test_float_and_double_share_a_family():
    assert spark_family("float") == spark_family("double") == "float"
    assert arrow_family(pa.float32()) == arrow_family(pa.float64()) == "float"


def test_decimal_is_its_own_family_any_precision():
    # the driver-hash hazard: DuckDB HUGEINT surfaces as decimal(38,0)
    # and must NOT family-match Spark bigint at equal values
    assert spark_family("decimal(12,2)") == "decimal"
    assert arrow_family(pa.decimal128(38, 0)) == "decimal"
    assert arrow_family(pa.decimal128(38, 0)) != arrow_family(pa.int64())


def test_timestamp_units_and_tz_collapse():
    assert spark_family("timestamp") == "timestamp"
    assert spark_family("timestamp_ntz") == "timestamp"
    assert arrow_family(pa.timestamp("us")) == "timestamp"
    assert arrow_family(pa.timestamp("ns", tz="UTC")) == "timestamp"


def test_strings_dates_bools_match_across_engines():
    for spark_s, arrow_t, fam in (
        ("string", pa.large_string(), "str"),
        ("date", pa.date32(), "date"),
        ("boolean", pa.bool_(), "bool"),
    ):
        assert spark_family(spark_s) == arrow_family(arrow_t) == fam


def test_unknown_types_pass_through_and_cannot_false_match():
    # an unmapped type surfaces verbatim on each side, so two unknown
    # but different types can never accidentally share a family
    assert spark_family("array<bigint>") == "array<bigint>"
    assert arrow_family(pa.list_(pa.int64())) == str(pa.list_(pa.int64()))
    assert spark_family("array<bigint>") != arrow_family(pa.list_(pa.int64()))
