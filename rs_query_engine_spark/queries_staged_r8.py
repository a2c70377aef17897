"""Staged query registrations for ROUND 8 — implemented and locally
oracle-verified in round 7, HELD OUT of the driver registry until the
round-8 window has budget.

Why staged: round 7's 50-row driver window is exactly committed — the
18 round-6 staged activations front-load as unverified, leaving 32
re-check slots that cover all 17 r3-stamped rows plus the stalest r4
rows. Any further registration would evict a re-check (VERDICT r06
#5). These queries therefore run through the same local oracle-parity
harness (``tests/oracle/test_staged_r8_parity.py``, sf0.001 + sf0.01)
and activate in round 8 by flipping ``STAGED_R8_ENABLED`` in
``queries.py``.

Float-determinism discipline matches ``queries.py`` (see its module
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_query_engine_spark.queries import QueryFn, _t

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r8 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-8
    staged registry (merged live when STAGED_R8_ENABLED flips)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLE)
