"""Staged query registrations for ROUND 12 — the round-11 holding pen.

EMPTY at round-10 end by design: the activation gate
(``tests/oracle/test_staged_r11_parity.py`` + ``STAGED_R11_ENABLED``
in ``queries.py``) is created BEFORE the first round-11 query lands
(ADVICE r07 precedent), so every registration here is
verified-by-construction from its first commit. Round 11 fills this
pen while activating the r10 one; round 12 flips the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 11 (from round-10 loose ends — evaluate,
don't assume):

- Streaming dedup horizon-expiry: DO NOT attempt a corpus-scale
  exact oracle — when a key has several rows in one micro-batch,
  which row's timestamp lands in state is partition-order-dependent,
  and every later expiry epoch inherits that nondeterminism (r10
  finding). The synthetic pin
  (tests/unit/test_streaming_dedup_expiry.py — no TTL extension by
  duplicates, one-batch eviction lag, two-batch late-filter lag) is
  the final form. (The stream-STREAM siblings — inner, left-outer,
  and the chained join-into-agg pipeline with its measured 24 h
  watermark propagation — landed in the r10 pen.)
- transformWithStateInPandas timer-driven TTL operator (the 4.1
  arbitrary-state API with event-time timers — the one stateful
  surface still untested under out-of-order arrival).
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r11 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-11
    staged registry (merged live when STAGED_R11_ENABLED flips)."""

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
