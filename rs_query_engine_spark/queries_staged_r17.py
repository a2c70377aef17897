"""Staged query registrations for ROUND 18 — the round-17 holding pen.

EMPTY at creation (round-14 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r17_parity.py``, the
``STAGED_R17_ENABLED`` flag, and the ``_PEN_MODULES`` entry all exist
BEFORE the first round-17 query lands, so every registration is
verified-by-construction from its first commit). Rounds 15-17 fill it
(≤ ~15 queries — the rotation-backlog cap, see the BENCH_NOTES
ledger); round 18 flips the flag.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle.

Candidate leads (from round-14 loose ends — evaluate, don't assume):

- **SQL + Python-compute surfaces remain CLOSED** (r13-r16 pens):
  recursive CTE, SQL UDF/table function/scripting, pipe syntax,
  LATERAL, Observation, GROUP BY ALL, named params, IDENTIFIER(),
  EXECUTE IMMEDIATE, listagg, collations, try_*, the positional
  regexp trio, multi-distinct Expand, ``_metadata``; every Python
  tier incl. the full DataSource family. Scan 4.1 release notes
  before assuming anything new.
- **Avro still BLOCKED** (no spark-avro in pip pyspark);
  ``transformWithStateInPandas`` still BLOCKED (hard google.protobuf
  import). Do not re-probe unless the image changes.
- **The bucketed-broadcast hybrid similarity join** stays shelved
  unless a plan audit finds a shuffle it would remove (r11-r14:
  none).
- The rows-only trio (``similarity_ivf_kmeans``,
  ``agg_approx_percentile``, ``text_unigram_logprob``) stays
  rows-only by design with invariant companions — re-evaluate only
  if one becomes exactly oracle-able.
- Unexplored-but-plausible operator families if a round needs seeds:
  weighted/interval-censored medians via exact rank selection,
  A/B-test ratio metrics with exact numerator/denominator columns,
  per-key EWMA cross-checks against closed-form integer geometric
  sums, multi-way sortWithinPartitions write-layout audits, DuckDB-
  mirrorable grouping_id() slices over rollup frames.
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r17 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-17
    staged registry (merged live when STAGED_R17_ENABLED flips)."""

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
