"""Staged query registrations for ROUND 13 — the round-12 holding pen.

EMPTY at round-10 end by design: the activation gate
(``tests/oracle/test_staged_r12_parity.py`` + ``STAGED_R12_ENABLED``
in ``queries.py``) is created BEFORE the first round-12 query lands
(ADVICE r07 precedent), so every registration here is
verified-by-construction from its first commit. Round 12 fills this
pen while activating the r11 one; round 13 flips the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 12 (from round-11 loose ends — evaluate,
don't assume):

- **State-store data source, remaining surfaces**: round 11 landed
  the aPWS read (``stream_state_inspection`` — held keys ≙ ledger
  complement). Left: ``state-metadata`` as a registered audit,
  reading a WINDOWED AGG or stream-stream JOIN operator's state
  (different state layouts: ``value.groupState`` vs window/join
  structs), and snapshot-version time travel
  (``option("snapshotStartBatchId")``) if supported on HDFS-backed
  stores.
- The pure-Python DataSource family is COMPLETE as of round 11
  (batch read, pushFilters, two-phase-commit write, simple AND
  executor-parallel partitioned stream readers) — nothing left on
  this surface worth a pen slot.
- **transformWithStateInPandas** remains BLOCKED in this container:
  its driver worker hard-imports ``google.protobuf``
  (StateMessage_pb2), which is not installed and cannot be (probed
  round 11; ImportError in TransformWithStateInPySparkPythonPreInitRunner).
  The semantics are covered by ``streaming/stateful.py:
  ttl_flush_stream`` on applyInPandasWithState — do NOT burn a round
  re-probing unless protobuf appears in the image.
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r12 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-12
    staged registry (merged live when STAGED_R12_ENABLED flips)."""

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
