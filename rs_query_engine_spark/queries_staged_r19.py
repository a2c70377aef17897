"""Staged query registrations for ROUND 20 — the round-19 holding pen.

EMPTY at creation (round-16 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r19_parity.py``, the
``STAGED_R19_ENABLED`` flag, and the ``_PEN_MODULES`` entry all exist
BEFORE the first round-19 registration, so every query is
verified-by-construction from its first commit), then SEEDED the
same round with 3 queries hash-verified at sf0.001 + sf0.01:
``quality_utf8_validation_audit`` (the header's make_valid_utf8
lead, probed and landed — is_valid_utf8 / make_valid_utf8 /
try_validate_utf8 over deterministically-corrupted bytes, pinned by
reconstruction since DuckDB cannot hold invalid UTF8) and
``events_dau_wau_stickiness`` (the trailing-window-distinct
EXPANSION idiom: explode each (user, day) over the 7 days it
covers instead of a window distinct Spark cannot express or a
day×day self-join; the shared distinct is lineage-cut so the
corpus is scanned once — plan-pinned), and
``events_session_relative_features`` (row-grain session ordinal /
event index / time-into-session where every window rides ONE
user-keyed exchange via running maxes of the session-start
markers — plan-pinned single exchange). Rounds 17-19
fill the rest (≤ ~15 queries — the rotation-backlog cap, see the
BENCH_NOTES ledger); round 20 flips the flag. Flip cadence for context: round 16
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

- ``make_valid_utf8`` / ``try_validate_utf8``: LANDED same round
  (``quality_utf8_validation_audit`` below) — the replacement
  behavior was probed per corruption class (invalid start + tail
  byte → one U+FFFD with the tail surviving; lone continuation →
  one U+FFFD; truncated multi-byte prefix consumed as a unit) and
  the oracle reconstructs rather than parses.
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


from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rs_query_engine_spark.queries import _t  # noqa: E402

# ---------------------------------------------------------------------------
# Round-16 seed (the pen-header's make_valid_utf8 lead, probed and
# landed the same round the pen was created — r18-pen precedent)
# ---------------------------------------------------------------------------


@register_staged(
    "quality_utf8_validation_audit",
    oracle="""
    SELECT doc_id,
           (doc_id % 7 <> 0 AND doc_id % 11 <> 0) AS is_valid,
           lang || CASE WHEN doc_id % 7 = 0 THEN chr(65533) || '('
                        WHEN doc_id % 11 = 0 THEN chr(65533)
                        ELSE '-' END || source AS repaired,
           (doc_id % 7 = 0 OR doc_id % 11 = 0) AS quarantined,
           CAST(length(lang || CASE WHEN doc_id % 7 = 0
                                    THEN chr(65533) || '('
                                    WHEN doc_id % 11 = 0 THEN chr(65533)
                                    ELSE '-' END || source) AS BIGINT)
               AS repaired_chars
    FROM documents
    """,
)
def quality_utf8_validation_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """UTF8-VALIDATION corpus hygiene — ``is_valid_utf8`` /
    ``make_valid_utf8`` / ``try_validate_utf8`` (Spark 4.x) driven
    over deterministically-corrupted bytes and pinned by
    RECONSTRUCTION (DuckDB strings are strictly valid UTF8 and
    cannot parse the corrupt input — the oracle re-derives every
    output from the corruption schedule instead, the
    str_to_map-parse discipline). Two probed corruption classes:
    an invalid 2-byte start followed by a non-continuation
    (``0xC3 0x28`` → ONE U+FFFD, the '(' survives) on every 7th
    doc, and a lone continuation byte (``0x80`` → ONE U+FFFD) on
    every 11th; both replacement behaviors probed before this query
    existed (a truncated 3-byte prefix ``0xE2 0x82`` also collapses
    to ONE replacement — prefixes are consumed as a unit).
    ``try_validate_utf8`` is surfaced as a quarantine BOOLEAN (the
    raw invalid string must never reach the driver hash — Arrow
    would re-replace it lossily; ``repaired`` is valid by
    construction and hashes exactly). This is the byte-level
    pre-tokenization gate every multi-source text pipeline needs —
    mojibake rows get repaired or quarantined BEFORE they poison a
    tokenizer at 100 TB.

    Scale shape: map-side scalar codegen only — encode/concat/
    validate all inside one projection, no shuffle, no join, one
    pruned scan."""
    d = _t(spark, sf_dir, "documents")
    doc = F.col("doc_id")
    infix = (
        F.when(doc % 7 == 0, F.unhex(F.lit("C328")))
        .when(doc % 11 == 0, F.unhex(F.lit("80")))
        .otherwise(F.encode(F.lit("-"), "utf-8"))
    )
    s = F.concat(
        F.encode("lang", "utf-8"), infix, F.encode("source", "utf-8")
    ).cast("string")
    repaired = F.make_valid_utf8(s)
    return d.select(
        "doc_id",
        F.is_valid_utf8(s).alias("is_valid"),
        repaired.alias("repaired"),
        F.try_validate_utf8(s).isNull().alias("quarantined"),
        F.length(repaired).cast("bigint").alias("repaired_chars"),
    )


@register_staged(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               CAST(date_trunc('day', ts) AS DATE) AS day
        FROM events
    ),
    dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ),
    cover AS (
        SELECT DISTINCT user_id, CAST(g.d AS DATE) AS day
        FROM ud, LATERAL unnest(generate_series(
            CAST(day AS TIMESTAMP),
            CAST(day + INTERVAL 6 DAY AS TIMESTAMP),
            INTERVAL 1 DAY)) AS g(d)
    ),
    wau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS wau
        FROM cover GROUP BY day
    )
    SELECT day, dau, wau,
           CAST(dau AS DOUBLE) / CAST(wau AS DOUBLE) AS stickiness
    FROM dau JOIN wau USING (day)
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU STICKINESS — per day, distinct daily actives over
    distinct trailing-7-day actives (the engagement ratio every
    growth team tracks), computed with the time-window EXPANSION
    idiom: each (user, day) row is exploded to the 7 days it covers
    and deduplicated, so the trailing-window distinct becomes a
    plain groupBy count. This is the scale-correct spelling — a
    distinct over a trailing RANGE frame does not exist in Spark
    (count_distinct is unsupported in window frames), and the naive
    day×day self-join re-scans the per-day frame 7 times; expansion
    is one linear explode (×7, bounded by the window length) over
    the already-deduplicated (user, day) frame, then partial+final
    counts. WAU days past the corpus edge fall out of the inner
    join with the DAU frame; the ratio is one raw double division.

    Scale shape: the corpus is touched ONCE — the (user, day)
    distinct is lineage-cut (``truncate_lineage``, the ab_lift
    precedent: both the DAU and WAU branches consume it, and
    without the cut Catalyst re-derives it per branch, scanning the
    corpus twice — plan-pinned to one scan); everything downstream
    — expansion, second distinct, both counts, the day-keyed join —
    runs on frames bounded by |users|·|days| and |users|·|days|·7,
    never corpus rows. No window-function distinct, no self-join."""
    from rs_query_engine_spark.session import truncate_lineage

    e = _t(spark, sf_dir, "events")
    ud = (
        e.select(
            "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .distinct()
        .transform(truncate_lineage)
    )
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(F.sequence("day", F.date_add("day", 6))).alias("day"),
    ).distinct()
    wau = cover.groupBy("day").agg(F.count(F.lit(1)).alias("wau"))
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


@register_staged(
    "events_session_relative_features",
    oracle="""
    WITH o AS (
        SELECT user_id, event_id, ts,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               CASE WHEN LAG(ts) OVER w1 IS NULL
                         OR ts - LAG(ts) OVER w1 >= INTERVAL 5 MINUTE
                    THEN 1 ELSE 0 END AS new_sess,
               ROW_NUMBER() OVER w1 AS rn
        FROM events
        WINDOW w1 AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(SUM(new_sess) OVER w2 AS BIGINT) AS session_ordinal,
           CAST(rn - MAX(CASE WHEN new_sess = 1 THEN rn END) OVER w2 + 1
                AS BIGINT) AS event_index,
           CAST(us - MAX(CASE WHEN new_sess = 1 THEN us END) OVER w2
                AS BIGINT) AS us_into_session
    FROM o
    WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING)
    """,
)
def events_session_relative_features(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-EVENT session-relative features — session ordinal, event
    index within session, and microseconds since session start: the
    row-grain enrichment sequence models train on
    (``events_sessionization`` aggregates the same 5-minute-gap
    sessions away; this keeps every event row). Spelled so EVERY
    window shares ONE (user_id)-partitioning with one ordering: the
    session id is a running SUM over the lag-gap marker, and both
    relative features come from a running MAX of the
    session-START row's rank/epoch (the start row always carries
    the marker), so no (user, session)-keyed second window ever
    materializes. Ordinals/indices/epochs are exact int64
    end-to-end; ``unix_micros`` not ``unix_timestamp`` (the
    CLAUDE.md truncation invariant).

    Scale shape: ONE exchange + ONE in-partition sort feed the lag,
    the rank, the running sum, and both running maxes — the naive
    spelling re-shuffles on (user, session_id) for the per-session
    window; this plan is pinned to a single hashpartitioning(user)
    exchange and zero joins."""
    from pyspark.sql import Window

    e = _t(spark, sf_dir, "events")
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w2 = w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ts = F.col("ts")
    gap_us = F.lit(5 * 60 * 1_000_000)
    us = F.unix_micros(ts.cast("timestamp"))
    o = e.select(
        "user_id",
        "event_id",
        "ts",
        us.alias("us"),
        F.when(
            F.lag(us).over(w1).isNull()
            | (us - F.lag(us).over(w1) >= gap_us),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
        F.row_number().over(w1).alias("rn"),
    )
    start_rn = F.max(
        F.when(F.col("new_sess") == 1, F.col("rn"))
    ).over(w2)
    start_us = F.max(
        F.when(F.col("new_sess") == 1, F.col("us"))
    ).over(w2)
    return o.select(
        "user_id",
        "event_id",
        F.sum("new_sess").over(w2).cast("bigint").alias("session_ordinal"),
        (F.col("rn") - start_rn + 1).cast("bigint").alias("event_index"),
        (F.col("us") - start_us).cast("bigint").alias("us_into_session"),
    )
