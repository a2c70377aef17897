"""DuckDB-oracle parity tests — a local mirror of the driver's t2 gate.

For every registered query that has oracle SQL, run the Spark query and
the DuckDB SQL on the same parquet tables and compare row count, column
names, and order-insensitive values EXACTLY (the rounding discipline in
``rs_query_engine_spark.queries`` is what makes exact float comparison
viable). This is stricter than eyeballing and mirrors
``__spark_entry__.py``'s contract (SURVEY §5c).
"""

from __future__ import annotations

import datetime
import math
import os

import duckdb
import pytest

from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.sources.corpus import TABLES

# default: smoke SF for speed; CI-style full check: SPARK_GRAFT_TEST_SF=0.01
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.execute(sql).fetch_arrow_table()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact — the rounding discipline in queries.py must be enough
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _normalize(rows, colnames):
    """Sort columns by name, then rows — order-insensitive compare."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(out, key=repr)


ORACLE_QUERIES = sorted(registry.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = registry.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    tbl = _duck(registry.oracle_sql()[name])
    duck_cols = tbl.column_names
    duck_rows = [tuple(r.values()) for r in tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns, nd = _normalize(spark_rows, spark_cols), _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


# --- result-type parity -------------------------------------------------
# The driver's value hash is type-sensitive: DuckDB surfacing a column
# as DECIMAL where Spark emits BIGINT hash-mismatches even when every
# value compares equal in Python (Decimal(5) == 5), which the value
# test above cannot catch. Map both engines' output types to a family
# and require exact family agreement per column.

from rs_query_engine_spark.typefamilies import (  # noqa: E402
    arrow_family as _arrow_family,
    spark_family as _spark_family,
)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_result_type_families_match(spark, name):
    q = registry.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_types = {f.name: _spark_family(f.dataType.simpleString()) for f in sdf.schema.fields}
    tbl = _duck(f"SELECT * FROM ({registry.oracle_sql()[name]}) LIMIT 0")
    duck_types = {f.name: _arrow_family(f.type) for f in tbl.schema}
    assert spark_types == duck_types, (
        f"{name}: type-family mismatch (driver hash is type-sensitive)"
    )
