"""Staged query registrations for ROUND 15 — the round-14 holding pen.

EMPTY at round-12 end by design: the activation gate
(``tests/oracle/test_staged_r14_parity.py`` + ``STAGED_R14_ENABLED``
in ``queries.py``) is created BEFORE the first round-14 query lands
(ADVICE r07 precedent), so every registration here is
verified-by-construction from its first commit. Round 13 fills this
pen while activating the r12 one; round 15 flips the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 13 (from round-12 loose ends — evaluate,
don't assume):

- **Streaming surfaces are broadly COMPLETE**: state-store reader
  (all layouts + time travel + growth + offset-log audit, r12 pen),
  quarantine routing batch+stream (r12/r13 pens), windowed
  approx-distinct (r13 pen), TTL flush, stream-stream joins with
  late tiers, IVM. ``transformWithStateInPandas`` remains BLOCKED
  (hard ``google.protobuf`` import — probed r11; do not re-probe
  unless protobuf appears in the image).
- **LANDED IN THE R13 PEN — do not rebuild**: dynamic-gap session
  windows (batch ``session_window`` with a STRING gap expression —
  a DayTimeIntervalType CASE is rejected, measured), the
  range-clustered write-layout audit, native ``WITH RECURSIVE``
  (UnionLoop; UNION-dedup recursion rejected with
  UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE — measured, don't re-probe),
  SQL UDFs (nesting works; SQL TABLE functions reject a
  parameterized LIMIT — INVALID_LIMIT_LIKE_EXPRESSION, measured),
  SQL pipe syntax, LATERAL correlated top-k, and the Observation
  API single-pass audit.
- **Remaining probe-worthy Spark 4.x surfaces**: SQL scripting
  (``BEGIN … END`` compound statements), a polymorphic Python UDTF
  (``analyze()`` static method computing the output schema from the
  input), and a SQL TVF with a CONSTANT limit (the allowed form).
- **A bucketed-broadcast hybrid similarity join** if any plan audit
  surfaces a shuffle worth removing (carried lead — none found in
  the r11/r12 audits).
- **Drift families**: the r13 pen's quality-gate drift covers pass
  rates; an embedding-space drift per label/source (centroid shift
  between GENERATIONS — a deterministic perturbation twin) would
  close the loop with ``embedding_snapshot_drift`` (which drifts
  over snapshot halves). Use its exact-quantization float pattern
  (floor(x·2^30) integer sums).
- The rows-only trio (``similarity_ivf_kmeans``,
  ``agg_approx_percentile``, ``text_unigram_logprob``) stays
  rows-only by design with invariant companions — re-evaluate only
  if one becomes exactly oracle-able.
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r14 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-14
    staged registry (merged live when STAGED_R14_ENABLED flips)."""

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
