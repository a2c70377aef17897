"""Staged query registrations for ROUND 11 — the round-10 holding pen.

EMPTY at round-9 end by design: the activation gate
(``tests/oracle/test_staged_r10_parity.py`` + ``STAGED_R10_ENABLED``
in ``queries.py``) is created BEFORE the first query lands (ADVICE
r07 precedent — a pen whose harness pre-exists makes every future
registration verified-by-construction). Round 10 fills this file with
new operators while it activates ``queries_staged_r9.py``; round 11
flips the flag.

Same contract as every pen: exact-alias DuckDB oracles verified at
sf0.001 + sf0.01, the float-determinism discipline of ``queries.py``'s
module docstring, a plan test for every operator whose value is its
plan shape, and pre-listed ``BIG_TABLE_BROADCAST_OK`` entries for any
legitimate fixed-cardinality subset broadcast.
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r10 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-10
    staged registry (merged live when STAGED_R10_ENABLED flips)."""

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
