"""Staged query registrations for ROUND 16 — the round-15 holding pen.

EMPTY at creation (round-13 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r15_parity.py``, the
``STAGED_R15_ENABLED`` flag, and the ``_PEN_MODULES`` entry all
exist BEFORE the first round-15 query lands, so every registration
is verified-by-construction from its first commit). Round 14 fills
this pen (≤ ~15 queries — the rotation-backlog cap, see the
BENCH_NOTES ledger) while activating the r13 one; round 16 flips
the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads for round 14 (from round-13 loose ends — evaluate,
don't assume):

- **SQL surfaces are CLOSED as of the r13/r14 pens**: WITH
  RECURSIVE/UnionLoop, SQL UDFs + table function, SQL scripting,
  pipe syntax, LATERAL, Observation API (r13 pen); GROUP BY ALL,
  named parameters, IDENTIFIER(), EXECUTE IMMEDIATE (r14 pen).
  Nothing known remains — scan Spark release notes before assuming.
- **Python-compute tiers are CLOSED**: row UDTF (fixed +
  polymorphic), pandas scalar/grouped-agg/grouped-apply,
  mapInPandas, mapInArrow, applyInArrow, applyInPandasWithState,
  Arrow-batch DataSources. ``transformWithStateInPandas`` remains
  BLOCKED (hard ``google.protobuf`` import — do not re-probe unless
  protobuf appears in the image).
- **Source/sink formats**: parquet, CSV, JSON, ORC, XML, text,
  memory, rate-micro-batch, Python DataSources, quarantine pairs,
  foreachBatch upsert all live or penned. Remaining leads: the
  ``binaryFile`` source (needs a content-hash-only projection to be
  deterministic), Avro (NOT bundled with pip pyspark — probe before
  building).
- **A bucketed-broadcast hybrid similarity join** if a plan audit
  surfaces a shuffle worth removing (carried since r11 — none found
  in the r11/r12/r13 audits).
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
# justifying why SQL can't express it; the r15 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-15
    staged registry (merged live when STAGED_R15_ENABLED flips)."""

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
