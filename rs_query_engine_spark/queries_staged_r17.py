"""Staged query registrations for ROUND 18 — the round-17 holding pen.

EMPTY at creation (round-14 end; ADVICE r07 precedent: the pen, its
parity gate ``tests/oracle/test_staged_r17_parity.py``, the
``STAGED_R17_ENABLED`` flag, and the ``_PEN_MODULES`` entry all exist
BEFORE the first round-17 query lands, so every registration is
verified-by-construction from its first commit), then seeded the
same round with 2 queries hash-verified at sf0.001 + sf0.01: the
exact WEIGHTED median by integer rank selection (the length of the
document holding the median character — 2·cum ≥ total crossing,
WindowGroupLimit-pushed rn=1 pick) and SYSTEMATIC PPS sampling
(per-source Hamilton budgets walked as evenly-spaced integer
thresholds over the running character mass — Σ hits = K by
telescoping, multiplicity for oversized docs, two corpus scans
total). Rounds 15-17 fill the rest (≤ ~15 queries — the
rotation-backlog cap, see the BENCH_NOTES ledger); round 18 flips
the flag.

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


from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from rs_query_engine_spark.queries import _t  # noqa: E402

# ---------------------------------------------------------------------------
# Round-14 seeds (r13-r16 precedent: the pen is created at round end
# and seeded the same round with a few verified queries)
# ---------------------------------------------------------------------------


@register_staged(
    "agg_weighted_median_exact",
    oracle="""
    WITH s AS (
        SELECT source, doc_id, n_chars,
               SUM(n_chars) OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum,
               CAST(SUM(n_chars) OVER (PARTITION BY source) AS BIGINT)
                   AS total_chars,
               CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT)
                   AS n_docs
        FROM documents
    ),
    q AS (
        SELECT source, doc_id, n_chars, n_docs, total_chars,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn
        FROM s WHERE 2 * cum >= total_chars
    )
    SELECT source, n_docs, total_chars,
           CAST(n_chars AS BIGINT) AS median_chars,
           doc_id AS median_doc
    FROM q WHERE rn = 1
    """,
)
def agg_weighted_median_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED median by exact rank selection — per source, the
    length of the document holding the MEDIAN CHARACTER (the first
    row, in (length, doc_id) order, whose cumulative mass reaches
    half the source total): the "typical document a random TOKEN
    lives in", which skews far above the doc-count median whenever a
    few giants carry most of the mass — the number that decides
    chunking and packing parameters, where the unweighted median
    misleads. SELECTION, not interpolation: the crossing rule
    ``2·cum ≥ total`` is pure int64, the winning row is unique by
    the detied ordering (within equal lengths the qualifying rows
    are a doc_id suffix, so rn=1 is well-defined on both engines),
    and no float exists anywhere in the query.

    Scale shape: both mass frames (running + full-partition) share
    the (source)-keyed exchange; the crossing filter and the rn=1
    pick run on the same sorted partitions — one keyed sort powers
    everything, no join, no global order."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select(
        "source", "doc_id", "n_chars"
    )
    wo = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wfull = Window.partitionBy("source")
    s = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.sum("n_chars")
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
        F.sum("n_chars").over(wfull).alias("total_chars"),
        F.count(F.lit(1)).over(wfull).alias("n_docs"),
    )
    q = s.filter(2 * F.col("cum") >= F.col("total_chars")).select(
        "source",
        "doc_id",
        "n_chars",
        "n_docs",
        "total_chars",
        F.row_number().over(wo).alias("rn"),
    )
    return q.filter(F.col("rn") == 1).select(
        "source",
        "n_docs",
        "total_chars",
        F.col("n_chars").alias("median_chars"),
        F.col("doc_id").alias("median_doc"),
    )


_PPS_K = 500  # total systematic sample budget across the corpus


@register_staged(
    "sample_systematic_pps",
    oracle=f"""
    WITH mass AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS m_s
        FROM documents GROUP BY source
    ),
    quota AS (
        SELECT source, m_s,
               ({_PPS_K} * m_s) // SUM(m_s) OVER () AS base,
               ({_PPS_K} * m_s) % SUM(m_s) OVER () AS rem
        FROM mass
    ),
    alloc AS (
        SELECT source, m_s,
               CAST(base + CASE WHEN
                   ROW_NUMBER() OVER (ORDER BY rem DESC, source)
                       <= {_PPS_K} - SUM(base) OVER ()
                   THEN 1 ELSE 0 END AS BIGINT) AS k_s
        FROM quota
    ),
    c AS (
        SELECT d.doc_id, d.source, d.n_chars, a.k_s, a.m_s,
               SUM(d.n_chars) OVER (PARTITION BY d.source
                                    ORDER BY d.doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents d JOIN alloc a USING (source)
    )
    SELECT doc_id, source, n_chars,
           CAST((k_s * cum) // m_s
                - (k_s * (cum - n_chars)) // m_s AS BIGINT) AS n_hits
    FROM c
    WHERE (k_s * cum) // m_s > (k_s * (cum - n_chars)) // m_s
    """,
)
def sample_systematic_pps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYSTEMATIC probability-proportional-to-size sampling — the
    survey-sampling classic that actually BUILDS the sample the
    Hamilton apportionment only budgets: each source's character
    mass is walked in fixed doc_id order and a document is selected
    every time the running mass crosses one of its source's k_s
    evenly-spaced thresholds (``⌊k_s·cum/m_s⌋`` increments), so
    selection probability is exactly proportional to document size,
    Σ n_hits = k_s per source and = K overall BY CONSTRUCTION (the
    floors telescope), and a document bigger than the stride is
    selected with multiplicity — the n_hits column — rather than
    silently capping. Every threshold comparison is int64 (products
    ≤ K·total_mass), the per-source budgets come from the same
    largest-remainder rule ``sample_proportional_allocation`` pins,
    and nothing floats anywhere.

    Scale shape: mass rollup (partial+final), a |sources|-row
    Hamilton frame (broadcast 1-row total + one tiny window), the
    alloc broadcast-joined back onto the corpus scan, then ONE
    (source)-keyed sort powers the running mass and the selection is
    a map-side integer filter — no global order, no second pass."""
    from pyspark.sql import Window

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    mass = d.groupBy("source").agg(F.sum("n_chars").alias("m_s"))
    # total mass as a window over the |sources|-row frame, NOT a
    # second aggregate cross-joined back: Catalyst does not dedupe
    # the shared subtree, so the crossJoin form scans the corpus a
    # second (and third) time for a single number
    wall = Window.partitionBy()
    quota = mass.select(
        "source",
        "m_s",
        F.expr(
            f"({_PPS_K} * m_s) DIV sum(m_s) OVER ()"
        ).alias("base"),
        (
            (F.lit(_PPS_K) * F.col("m_s"))
            % F.sum("m_s").over(wall)
        ).alias("rem"),
    )
    wrank = Window.orderBy(F.col("rem").desc(), F.col("source"))
    alloc = quota.select(
        "source",
        "m_s",
        (
            F.col("base")
            + F.when(
                F.row_number().over(wrank)
                <= F.lit(_PPS_K) - F.sum("base").over(wall),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("k_s"),
    )
    wcum = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c = d.join(F.broadcast(alloc), "source").select(
        "doc_id",
        "source",
        "n_chars",
        "k_s",
        "m_s",
        F.sum("n_chars").over(wcum).alias("cum"),
    )
    lo = F.expr("(k_s * (cum - n_chars)) DIV m_s")
    hi = F.expr("(k_s * cum) DIV m_s")
    return c.filter(hi > lo).select(
        "doc_id", "source", "n_chars", (hi - lo).alias("n_hits")
    )
