"""Staged query registrations for ROUND 14 — the round-13 holding pen.

EMPTY at round-11 end by design: the activation gate
(``tests/oracle/test_staged_r13_parity.py`` + ``STAGED_R13_ENABLED``
in ``queries.py``) is created BEFORE the first round-13 query lands
(ADVICE r07 precedent), so every registration here is
verified-by-construction from its first commit. Round 13 fills this
pen while activating the r12 one; round 14 flips the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 13 (from round-11 loose ends — evaluate,
don't assume):

- **State-store reader is COMPLETE as of the r12 pen** (aPWS,
  windowed agg, stream-stream join, state-metadata, batchId time
  travel, growth curve, offset-log watermark audit).
  ``snapshotStartBatchId`` was probed r11 and fails on 5-batch
  HDFS checkpoints (no ``.snapshot`` written below
  minDeltasForSnapshot) — only worth revisiting with a
  deliberately long feed or a lowered snapshot threshold.
- **Python DataSource family is COMPLETE** (tuple + Arrow batch
  readers, pushFilters, schema-subset pruning, two-phase-commit
  writer, simple + partitioned + ARROW-BATCH stream readers — the
  last landed round 11 as ``pydatasource.CsvArrowStreamDataSource``,
  unit-pinned value-identical to the tuple stream reader AND
  registered with an exact oracle in the r12 pen
  (``source_python_arrow_stream``) — nothing left on this surface.
- **transformWithStateInPandas** remains BLOCKED in this container
  (hard ``google.protobuf`` import, probed r11) — do not re-probe
  unless protobuf appears in the image.
- TWO of the original round-13 leads landed in the r12 pen already
  (round 11 had slack under the ≤15 cap): exact-integer mass
  diffusion (``graph.integer_mass_diffusion`` +
  ``graph_mass_diffusion``, conservation property-pinned) and the
  quarantine writer (``sinks.quarantine_json`` +
  ``source_quarantine_roundtrip``, DLQ repaired-and-recovered
  audit). Do NOT rebuild them.
- Remaining lead: windowed DISTINCT aggregation in streams —
  streaming aggs reject COUNT(DISTINCT) outright (measured
  AnalysisException, see ``source_python_arrow_stream``'s
  docstring); the streaming form is ``approx_count_distinct`` over
  event-time windows, registered rows-only-with-invariant-companion
  or checked via an exact batch twin on the same admitted set.
- Other candidates: a streaming foreachBatch QUARANTINE query — the
  SINK already exists and is unit-pinned
  (``sinks.quarantine_json_stream``: batch-id-partitioned dynamic
  overwrite, restart-idempotent, valid-all-null objects stay good);
  registering it is a cheap slot like the arrow stream reader was.
  Also: migrate the path-only-keyed CSV/JSON table copies
  (``queries.source_csv_roundtrip``'s ``rsqes_csv_{digest}`` dir,
  shared by ``pydatasource.ensure_customer_csv``) to the
  mtime+size-keyed ``artifacts.artifact_root`` machinery — an
  in-place corpus regen currently serves them stale (the r12
  ``badjson`` fixture already made the switch; keep the two CSV
  users sharing ONE artifact when migrating). Also: per-domain
  quality-gate drift (the dataset card diffed
  across two corpus generations), and a bucketed-broadcast hybrid
  similarity join if any plan audit surfaces a shuffle worth
  removing.
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r13 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-13
    staged registry (merged live when STAGED_R13_ENABLED flips)."""

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
