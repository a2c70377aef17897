"""Staged query registrations for ROUND 19 — the round-18 holding pen.

EMPTY at creation (round-15 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r18_parity.py``, the
``STAGED_R18_ENABLED`` flag, and the ``_PEN_MODULES`` entry all exist
BEFORE the first round-18 registration, so every query is
verified-by-construction from its first commit). Rounds 16-18 seed
it (≤ ~15 queries — the rotation-backlog cap, see the BENCH_NOTES
ledger); round 19 flips the flag. Flip cadence for context: round 16
flips the r15 pen, round 17 flips the r16 pen, round 18 flips the
r17 pen (closed at 15 in round 15), round 19 flips this one.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle; DuckDB decimal→double casts go
through the VARCHAR hop.

Candidate leads (round-15 loose ends — evaluate, don't assume):

- **SQL + Python-compute surfaces remain CLOSED** (r13-r17 pens):
  recursive CTE, SQL UDF/table function/scripting, pipe syntax,
  LATERAL, Observation, GROUP BY ALL, named params, IDENTIFIER(),
  EXECUTE IMMEDIATE, listagg, collations, try_*, positional regexp,
  multi-distinct Expand, ``_metadata``, GROUPING SETS + ROLLUP +
  CUBE + PIVOT, the Spark-4.1 TIME type, VARIANT, every Python tier
  incl. the full DataSource family with filter pushdown. Scan the
  installed 4.1.x surface once per round before assuming anything
  new (the round-15 scan note lives in the r17 pen header).
- **Avro still BLOCKED** (no spark-avro in pip pyspark);
  ``transformWithStateInPandas`` still BLOCKED (hard google.protobuf
  import). Do not re-probe unless the image changes.
- **Probed and REJECTED at round 15** (don't re-evaluate without new
  facts): theta/hll sketch aggs (approx-only — would grow the
  rows-only set held at three by design), uniform/randstr
  (partition-order-dependent), pairwise source vocabulary-Jaccard
  (trivial pin on this corpus), phonetic joins (DuckDB 1.0 has no
  soundex), moving median over row frames (interpolation roulette).
- The rows-only trio (``similarity_ivf_kmeans``,
  ``agg_approx_percentile``, ``text_unigram_logprob``) stays
  rows-only by design with invariant companions — re-evaluate only
  if one becomes exactly oracle-able.
- Unexplored-but-plausible families for seeds: MAP-typed column
  operators (map_from_entries / map_filter / transform_values with
  an explode-to-rows boundary — MAP cells can't reach the driver
  hash), sequence()-generated calendar/grid frames beyond gap_fill,
  sessionized funnel steps with per-step conversion decay, exact
  reservoir-free stratified minima (min_by per stratum matrix),
  anti-entropy checksum DIFF of two table generations (pairs with
  maintenance_table_checksum), percent-of-parent ratios down a
  rollup hierarchy (pairs with agg_rollup_returnflag).
"""

from __future__ import annotations

from rs_query_engine_spark.queries import QueryFn

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}

# Queries deliberately registered WITHOUT a DuckDB oracle (rows-only
# driver check). Every entry needs a registration-site docstring
# justifying why SQL can't express it; the r18 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-18
    staged registry (merged live when STAGED_R18_ENABLED flips)."""

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
