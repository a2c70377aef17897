"""DuckDB-oracle parity for ROUND-19 staged queries.

Same gate as ``test_oracle_parity.py`` — value-exact compare plus the
type-family check the driver hash is sensitive to — run over
``rs_query_engine_spark.queries_staged_r19``. The harness exists
while the pen is still empty (ADVICE r07 precedent) so every
round-19 registration is verified-by-construction from its first
commit.
"""

from __future__ import annotations

import pytest

from rs_query_engine_spark import queries_staged_r19 as staged

# no tests/__init__.py: pytest rootless mode puts this directory on
# sys.path, so the sibling harness imports as a top-level module
from test_oracle_parity import (
    SF_DIR,
    _arrow_family,
    _duck,
    _normalize,
    _spark_family,
)

STAGED_QUERIES = sorted(staged.queries())
ORACLED = sorted(staged.oracle_sql())


def test_staged_r19_rows_only_queries_are_documented():
    rows_only_by_design: set[str] = set(staged.ROWS_ONLY_BY_DESIGN)
    assert set(STAGED_QUERIES) - set(ORACLED) == rows_only_by_design


def test_staged_r19_names_collide_with_nothing_live():
    from rs_query_engine_spark import queries as registry

    # every OTHER pen, discovered from the same registry table the
    # live merge uses — a new pen needs no edit here
    for mod in registry.all_pen_modules():
        if mod.__name__.endswith("queries_staged_r19"):
            continue
        assert not set(staged.queries()) & set(mod.queries()), mod.__name__
    assert not set(staged.queries()) & set(registry._QUERIES)


@pytest.mark.parametrize("name", ORACLED or ["__pen_empty__"])
def test_staged_r19_query_matches_oracle(spark, name):
    if name == "__pen_empty__":
        pytest.skip("r19 pen is still empty (created at round-16 end)")
    sdf = staged.queries()[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    tbl = _duck(staged.oracle_sql()[name])
    duck_cols = tbl.column_names
    duck_rows = [tuple(r.values()) for r in tbl.to_pylist()]

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ORACLED or ["__pen_empty__"])
def test_staged_r19_result_type_families_match(spark, name):
    if name == "__pen_empty__":
        pytest.skip("r19 pen is still empty (created at round-16 end)")
    sdf = staged.queries()[name](spark, SF_DIR)
    spark_types = {
        f.name: _spark_family(f.dataType.simpleString())
        for f in sdf.schema.fields
    }
    tbl = _duck(f"SELECT * FROM ({staged.oracle_sql()[name]}) LIMIT 0")
    duck_types = {f.name: _arrow_family(f.type) for f in tbl.schema}
    assert spark_types == duck_types, (
        f"{name}: type-family mismatch (driver hash is type-sensitive)"
    )


@pytest.mark.parametrize(
    "name", sorted(set(STAGED_QUERIES) - set(ORACLED)) or ["__pen_empty__"]
)
def test_staged_r19_rows_only_query_runs(spark, name):
    if name == "__pen_empty__":
        pytest.skip("r19 pen has no rows-only queries")
    sdf = staged.queries()[name](spark, SF_DIR)
    assert len(sdf.collect()) >= 0
