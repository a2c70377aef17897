"""Skew-mitigation operators. At 100 TB a handful of hot keys can pin
an entire stage on one executor; AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) covers
sort-merge joins, but aggregations over pathologically hot keys and
joins against a non-broadcastable-but-hot dimension need explicit
salting. These operators implement the two standard rewrites with
algebraic-aggregate merge semantics, so results are exactly the
unsalted answer.

- ``salted_aggregate``: groupBy(key, salt) partial → groupBy(key)
  merge. The hot key's rows split across ``num_salts`` reducers in
  round 1; round 2 merges only ``num_salts`` rows per key.
- ``salted_join``: replicate the build side once per salt value and
  scatter the probe side uniformly across salts — every reducer gets
  1/num_salts of the hot key's probe rows.

Salt derivation is ``pmod(xxhash64(uniquifier...), n)`` —
deterministic per row (so retries/speculative tasks agree), uniform,
and shuffle-stable; pass high-cardinality columns as the uniquifier.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (merge_fn, needs merge distinct from partial) per supported op
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # counts merge by summing
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _salt(uniquifier: Sequence[str | Column], num_salts: int) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in uniquifier]
    return F.pmod(F.xxhash64(*cols), F.lit(num_salts))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str | Column]],
    uniquifier: Sequence[str | Column],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output name → (op, input column) with op in
    sum/count/min/max (the algebraic set the reference implements,
    ``src/physical_plan/aggr/``; AVG = sum/count composed by the
    caller so the merge stays exact). Result is identical to
    ``df.groupBy(keys).agg(...)`` — the salt only splits the partial
    phase."""
    unsupported = [op for op, _ in aggs.values() if op not in _ALGEBRAIC]
    if unsupported:
        raise ValueError(f"non-algebraic ops cannot be salted exactly: {unsupported}")
    keys = list(keys)
    salted = df.withColumn("_salt", _salt(uniquifier, num_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _ALGEBRAIC[op][0](F.col(c) if isinstance(c, str) else c).alias(f"_p_{name}")
            for name, (op, c) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _ALGEBRAIC[op][1](f"_p_{name}").alias(name)
            for name, (op, _) in aggs.items()
        ]
    )


def salted_join(
    probe: DataFrame,
    build: DataFrame,
    on: Sequence[str],
    probe_uniquifier: Sequence[str | Column],
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: ``build`` is replicated ``num_salts``×
    (explode over the salt domain) and ``probe`` rows scatter to one
    salt each, so a hot join key spreads over ``num_salts`` reducers.

    Use when the build side is too large to broadcast but small enough
    that num_salts× replication is cheaper than one executor owning
    the hot key. Output equals ``probe.join(build, on, how)`` for
    inner/left joins."""
    on = list(on)
    p = probe.withColumn("_salt", _salt(probe_uniquifier, num_salts))
    b = build.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = p.join(b, on + ["_salt"], how)
    return joined.drop("_salt")
