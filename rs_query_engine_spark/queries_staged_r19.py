"""Staged query registrations for ROUND 20 — the round-19 holding pen.

EMPTY at creation (round-16 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r19_parity.py``, the
``STAGED_R19_ENABLED`` flag, and the ``_PEN_MODULES`` entry all exist
BEFORE the first round-19 registration, so every query is
verified-by-construction from its first commit). Rounds 17-19 fill
it (≤ ~15 queries — the rotation-backlog cap, see the BENCH_NOTES
ledger); round 20 flips the flag. Flip cadence for context: round 16
flipped the r15 pen, round 17 flips the r16 pen, round 18 flips the
r17 pen, round 19 flips the r18 pen (closed at 15 in round 16), and
round 20 — the final round — flips this one, so keep it SMALL enough
that its first-ever verification fits the round-20 window alongside
the re-check backlog.

Float-determinism discipline matches ``queries.py`` (see its module
docstring): row-level doubles raw, no round(), SUM/AVG through exact
decimals, every aggregate/computed column aliased identically in the
Spark code and the DuckDB oracle; DuckDB decimal→double casts go
through the VARCHAR hop.

Candidate leads (round-16 loose ends — evaluate, don't assume):

- ``make_valid_utf8`` / ``try_validate_utf8`` (new in the 4.x line):
  a UTF8-validation audit over deliberately-corrupted bytes — needs
  a corrupt-bytes fixture (binary-file source or unhex-built), and a
  DuckDB mirror through its stricter UTF8 handling; evaluate whether
  the two engines' replacement-character behavior can be made
  provably identical before seeding.
- The round-16 surface scan found nothing else new worth a slot:
  KLL/theta sketches remain REJECTED (approx-only — would grow the
  rows-only set held at three by design), TIME-type functions are
  covered by ``events_time_of_day_profile``, ``convert_timezone`` by
  ``events_timezone_bucketing``, the bitmap family by
  ``agg_bitmap_distinct``, ``monthname``/``dayname`` evaluated and
  not taken (inside ``date_functions``' weekday pin).
- **Avro still BLOCKED** (no spark-avro in pip pyspark);
  ``transformWithStateInPandas`` still BLOCKED (hard google.protobuf
  import). Do not re-probe unless the image changes.
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
# justifying why SQL can't express it; the r19 parity harness asserts
# this list is exactly the oracle-less set.
ROWS_ONLY_BY_DESIGN: frozenset[str] = frozenset()


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-19
    staged registry (merged live when STAGED_R19_ENABLED flips)."""

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
