"""Staged query registrations for ROUND 7 — implemented and locally
oracle-verified in round 6, HELD OUT of the driver registry until the
round-7 window has budget.

Why staged: round 6's 50-row driver window is exactly committed — 20
round-5 staged activations + 4 newly-oracled sketch/PQ queries
front-load as unverified, leaving 26 re-check slots for the stalest
verified rows (the r01 multimodal pair among them). Any further
registration would evict a re-check (VERDICT r05 #3/#7). These queries
therefore run through the same local oracle-parity harness
(``tests/oracle/test_staged_r7_parity.py``, sf0.001 + sf0.01) and
activate in round 7 by flipping ``STAGED_R7_ENABLED`` in
``queries.py``.

Float-determinism discipline matches ``queries.py`` (see its module
docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rs_query_engine_spark.queries import QueryFn, _t

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register_staged(name: str, oracle: str | None = None):
    """Decorator twin of ``queries.register`` writing to the round-7
    staged registry (merged live when STAGED_R7_ENABLED flips)."""

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


# =====================================================================
# Dedup — EXACT substring spans (Lee et al. ExactSubstr)
# =====================================================================

_SUBSTR_L = 25  # min duplicated-substring length, characters

# shared oracle CTE chain: normalized docs → all L-gram offsets →
# duplicated grams → duplicated positions → merged maximal islands
_SUBSTR_CTES = rf"""
    t AS (
        SELECT doc_id,
               trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text
        FROM documents
    ), g AS (
        SELECT doc_id, i AS off,
               substr(text, CAST(i + 1 AS BIGINT), {_SUBSTR_L}) AS gram
        FROM t, LATERAL UNNEST(generate_series(0, length(text) - {_SUBSTR_L}))
                AS u(i)
        WHERE length(text) >= {_SUBSTR_L}
    ), dup AS (
        SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ), p AS (
        SELECT g.doc_id, g.off FROM g JOIN dup USING (gram)
    ), isl AS (
        SELECT doc_id, off,
               CASE WHEN off > COALESCE(
                   MAX(off + {_SUBSTR_L}) OVER (
                       PARTITION BY doc_id ORDER BY off
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   -1)
               THEN 1 ELSE 0 END AS newi
        FROM p
    ), isl2 AS (
        SELECT doc_id, off,
               SUM(newi) OVER (PARTITION BY doc_id ORDER BY off) AS island
        FROM isl
    ), spans AS (
        SELECT doc_id,
               CAST(MIN(off) AS BIGINT) AS span_start,
               CAST(MAX(off) + {_SUBSTR_L} AS BIGINT) AS span_end,
               CAST(MAX(off) + {_SUBSTR_L} - MIN(off) AS BIGINT) AS span_len
        FROM isl2
        GROUP BY doc_id, island
    )
"""


@register_staged(
    "text_exact_substr_spans",
    oracle=f"""
    WITH {_SUBSTR_CTES}
    SELECT doc_id, span_start, span_end, span_len FROM spans
    """,
)
def text_exact_substr_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT duplicated-substring spans (Lee et al., "Deduplicating
    Training Data Makes Language Models Better" — the ExactSubstr
    side of the dedup spectrum; reference has no counterpart, its
    whole text surface is §2.5 CONCAT/SUBSTRING): every maximal
    character region of a document covered by some substring of
    length ≥ 25 that occurs at another (doc, offset) in the corpus.
    The exact counterpart of ``text_span_dedup``'s fingerprint
    approximation — same question, zero false positives/negatives.

    Semantics, plan shape, and the suffix-array equivalence argument
    live on :func:`rs_query_engine_spark.operators.dedup.
    exact_substring_spans` (property-tested against a pure-Python
    suffix-array + LCP reference in
    ``tests/unit/test_exact_substr.py``). All outputs are exact
    integers — hash-parity is by construction."""
    from rs_query_engine_spark.operators.dedup import exact_substring_spans

    d = _t(spark, sf_dir, "documents")
    return exact_substring_spans(d, "doc_id", "text", min_len=_SUBSTR_L)


@register_staged(
    "text_exact_substr_fraction",
    oracle=f"""
    WITH {_SUBSTR_CTES}
    SELECT t.doc_id,
           CAST(length(t.text) AS BIGINT) AS doc_len,
           CAST(COALESCE(SUM(s.span_len), 0) AS BIGINT) AS dup_chars,
           CAST(COALESCE(SUM(s.span_len), 0) AS DOUBLE)
               / CAST(length(t.text) AS DOUBLE) AS dup_frac
    FROM t LEFT JOIN spans s USING (doc_id)
    WHERE length(t.text) > 0
    GROUP BY t.doc_id, length(t.text)
    """,
)
def text_exact_substr_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-character FRACTION from the exact
    substring spans — the scalar each dedup policy actually thresholds
    on ("drop docs that are >80% duplicated text", "trim spans but
    keep docs below 20%"). Every document appears (LEFT join onto the
    span set, zero-filled), so the output is directly joinable as a
    quality column. dup_frac is one double division of two exact
    integers — both engines perform the identical IEEE op."""
    from rs_query_engine_spark.functions.text import normalize_text
    from rs_query_engine_spark.operators.dedup import exact_substring_spans
    from rs_query_engine_spark.sources.corpus import spread

    d = _t(spark, sf_dir, "documents")
    spans = exact_substring_spans(d, "doc_id", "text", min_len=_SUBSTR_L)
    lens = (
        spread(d)
        .select(
            "doc_id",
            F.length(normalize_text(F.col("text"))).cast("bigint").alias("doc_len"),
        )
        .filter(F.col("doc_len") > 0)
    )
    return (
        lens.join(spans.select("doc_id", "span_len"), "doc_id", "left")
        .groupBy("doc_id", "doc_len")
        .agg(
            F.coalesce(F.sum("span_len"), F.lit(0)).cast("bigint").alias("dup_chars")
        )
        .select(
            "doc_id",
            "doc_len",
            "dup_chars",
            (
                F.col("dup_chars").cast("double") / F.col("doc_len").cast("double")
            ).alias("dup_frac"),
        )
    )
