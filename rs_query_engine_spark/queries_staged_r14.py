"""Staged query registrations for ROUND 15 — the round-14 holding pen.

Seeded with TWO queries at round-12 end (round 12 had slack under
the ≤15 cap — the r11→r12 precedent): per-label EMBEDDING
GENERATION DRIFT (the carried lead — exact-quantized centroid-shift
L2 between a corpus generation and a deterministically perturbed
re-embed) and the POLYMORPHIC Python UDTF (``analyze()`` computing
the output schema from a DDL argument; pure-Python DDL parse because
``analyze`` runs without a SparkContext — measured). Both
hash-verified at sf0.001 + sf0.01 from their first commit. The
activation gate
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
- **Probe-worthy surfaces now CLOSED**: SQL scripting + the
  constant/parameterized TVF boundary landed in the r13 pen; the
  polymorphic UDTF landed HERE. Remaining: nothing known on the SQL
  surface — scan Spark release notes next round.
- **A bucketed-broadcast hybrid similarity join** if any plan audit
  surfaces a shuffle worth removing (carried lead — none found in
  the r11/r12 audits).
- **Drift families**: CLOSED — quality-gate drift (r13 pen) +
  embedding generation drift (here) complete the
  pass-rate/embedding-space pair alongside
  ``embedding_snapshot_drift``.
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


# ---------------------------------------------------------------------------
# Polymorphic Python UDTF (analyze() computes the schema from an arg)
# ---------------------------------------------------------------------------


class UnpackDelimUDTF:
    """Schema-polymorphic line unpacker: output columns derive from a
    DDL STRING ARGUMENT at analysis time (``analyze`` static method —
    the Python UDTF feature the fixed-schema ``udtf_lang_runs`` tier
    doesn't touch). The DDL parse must be PURE PYTHON:
    ``StructType.fromDDL`` needs a live SparkContext and ``analyze``
    runs in a side planner process without one (measured
    TABLE_VALUED_FUNCTION_FAILED_TO_ANALYZE_IN_PYTHON →
    SESSION_OR_CONTEXT_NOT_EXISTS), so only the flat
    ``name type, …`` grammar over {bigint, double, string} is
    accepted — exactly what a delimited line can carry."""

    _TYPES = ("bigint", "double", "string")

    @staticmethod
    def _fields(ddl: str) -> "list[tuple[str, str]]":
        out = []
        for part in ddl.split(","):
            name, typ = part.strip().split()
            if typ.lower() not in UnpackDelimUDTF._TYPES:
                raise ValueError(f"unsupported type {typ!r} in UDTF ddl")
            out.append((name, typ.lower()))
        return out

    @staticmethod
    def analyze(line, ddl):
        from pyspark.sql.udtf import AnalyzeResult
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StringType,
            StructField,
            StructType,
        )

        tm = {
            "bigint": LongType(),
            "double": DoubleType(),
            "string": StringType(),
        }
        return AnalyzeResult(
            StructType(
                [
                    StructField(n, tm[t])
                    for n, t in UnpackDelimUDTF._fields(ddl.value)
                ]
            )
        )

    def eval(self, line, ddl):
        casts = {"bigint": int, "double": float, "string": str}
        fs = UnpackDelimUDTF._fields(ddl)
        # maxsplit lets a trailing string field absorb embedded
        # delimiters; anything else (too few parts, or an embedded
        # '|' ahead of a non-string tail) is a hard error — the UDTF
        # is registered session-wide, so silent truncation/misalign
        # would corrupt callers beyond the pipe-free fixture.
        parts = line.split("|", len(fs) - 1)
        if len(parts) != len(fs):
            raise ValueError(
                f"rsqes_unpack_delim: line has {len(parts)} parts, "
                f"ddl declares {len(fs)} fields: {line!r}"
            )
        yield tuple(
            casts[t](p) if p != "" else None
            for p, (_n, t) in zip(parts, fs)
        )


_UDTF_DDL = "c_custkey bigint, c_name string, c_acctbal double"


@register_staged(
    "udtf_polymorphic_unpack",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    """,
)
def udtf_polymorphic_unpack(spark: SparkSession, sf_dir: str):
    """POLYMORPHIC Python UDTF — the ``analyze()`` static method
    computes the output schema from a (foldable) argument at
    analysis time, so ONE registered function unpacks any flat
    delimited layout the caller declares: customer rows are packed to
    '|'-delimited lines inline and round-tripped back through the
    UDTF with the schema passed as a DDL string. Row-level parity
    against the original table proves the dynamic schema binds types
    correctly AND that doubles survive the string trip (Spark's
    shortest-repr cast → Python ``float`` re-parse — the same
    bit-fidelity contract the CSV DataSource family pins).

    Per-row Python is the cost of this surface — it is the API demo
    and schema-flexibility tier; the Arrow-batch DataSource family is
    the production path for bulk parsing (measured ~3.8× faster,
    BENCH_NOTES r11)."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udtf

    from rs_query_engine_spark.queries import _t

    spark.udtf.register("rsqes_unpack_delim", udtf(UnpackDelimUDTF))
    (
        _t(spark, sf_dir, "customer")
        .select(
            F.concat_ws(
                "|",
                F.col("c_custkey").cast("string"),
                F.col("c_name"),
                F.col("c_acctbal").cast("string"),
            ).alias("line")
        )
        .createOrReplaceTempView("rsqes_udtf_lines")
    )
    return spark.sql(
        f"""
        SELECT u.* FROM rsqes_udtf_lines,
        LATERAL rsqes_unpack_delim(line, '{_UDTF_DDL}') u
        """
    )


# ---------------------------------------------------------------------------
# Embedding drift between corpus GENERATIONS, per label
# ---------------------------------------------------------------------------

# Generation B simulates a deterministic re-embedding regression:
# every 5th vector is uniformly scaled by 0.9 (a norm bug — the
# commonest real re-embed failure). Quantization constants follow
# embedding_snapshot_drift: 2^30 for components (exact exponent
# shift), 2^40 for the squared shifts so their cross-dimension sum is
# EXACT integer arithmetic (cross-row double addition would be
# order-dependent).
_EGD_PERT_MOD = 5
_EGD_SCALE = 0.9
_Q30 = 1073741824.0  # 2^30
_Q40 = 1099511627776.0  # 2^40


@register_staged(
    "embedding_generation_drift",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
    ), x AS (
        SELECT label,
               generate_subscripts(v, 1) - 1 AS dim,
               CAST(FLOOR(unnest(v) * {_Q30}) AS BIGINT) AS xq_a,
               CAST(FLOOR((unnest(v)
                    * CASE WHEN vec_id % {_EGD_PERT_MOD} = 0
                           THEN {_EGD_SCALE} ELSE 1.0 END)
                    * {_Q30}) AS BIGINT) AS xq_b
        FROM e
    ), s AS (
        SELECT label, CAST(dim AS INT) AS dim, COUNT(*) AS n,
               CAST(SUM(xq_a) AS DOUBLE) AS sa,
               CAST(SUM(xq_b) AS DOUBLE) AS sb
        FROM x GROUP BY label, dim
    ), sh AS (
        SELECT label, n,
               sb / {_Q30} / CAST(n AS DOUBLE)
                   - sa / {_Q30} / CAST(n AS DOUBLE) AS shift
        FROM s
    ), q AS (
        SELECT label, n,
               CAST(FLOOR(shift * shift * {_Q40}) AS BIGINT) AS q2
        FROM sh
    )
    SELECT label, MAX(n) AS n_vecs,
           SQRT(CAST(SUM(q2) AS DOUBLE) / {_Q40}) AS l2_centroid_shift
    FROM q GROUP BY label
    """,
)
def embedding_generation_drift(spark: SparkSession, sf_dir: str):
    """Per-LABEL centroid drift between two embedding GENERATIONS —
    the promotion gate for a re-embedding backfill (model upgrade,
    quantization change): generation B deterministically scales every
    {mod}th vector by {scale} (a norm regression), and the L2 shift
    of each label's centroid between generations is the alarm that
    fires before retrieval quality visibly degrades. Closes the loop
    with ``embedding_snapshot_drift`` (which drifts per DIMENSION
    over snapshot halves): this one drifts per GROUP over
    generations, reduced to a single L2 magnitude.

    Float discipline (the snapshot-drift pattern, extended one
    level): components quantize to exact 2^-30 integers BEFORE any
    cross-row sum; the per-dimension mean shift is a fixed float op
    sequence; and the cross-DIMENSION reduction — where a double sum
    would be order-dependent again — quantizes the squared shifts to
    exact 2^-40 integers first, so the only floats in the output are
    a final exact division and one sqrt. Both generations ride ONE
    scan (the perturbation is a projected CASE).

    Scale shape: explode fans map-side, partial aggregation collapses
    to |labels|x|dims| rows before the one shuffle; the label
    reduction reuses nothing corpus-sized."""
    from pyspark.sql import functions as F

    from rs_query_engine_spark.queries import _t

    e = _t(spark, sf_dir, "embeddings")
    factor = F.when(
        F.col("vec_id") % _EGD_PERT_MOD == 0, F.lit(_EGD_SCALE)
    ).otherwise(F.lit(1.0))
    x = e.select(
        "label",
        factor.alias("f"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "xv"
        ),
    ).select(
        "label",
        "dim",
        F.floor(F.col("xv") * F.lit(_Q30)).cast("long").alias("xq_a"),
        F.floor((F.col("xv") * F.col("f")) * F.lit(_Q30))
        .cast("long")
        .alias("xq_b"),
    )
    s = x.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xq_a").cast("double").alias("sa"),
        F.sum("xq_b").cast("double").alias("sb"),
    )
    shift = (
        F.col("sb") / F.lit(_Q30) / F.col("n").cast("double")
        - F.col("sa") / F.lit(_Q30) / F.col("n").cast("double")
    )
    q = s.select(
        "label",
        "n",
        F.floor((shift * shift) * F.lit(_Q40)).cast("long").alias("q2"),
    )
    return q.groupBy("label").agg(
        F.max("n").alias("n_vecs"),
        F.sqrt(F.sum("q2").cast("double") / F.lit(_Q40)).alias(
            "l2_centroid_shift"
        ),
    )
