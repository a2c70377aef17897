"""Property-based cross-validation for the staged operator modules
(hypothesis): randomized inputs against independent pure-Python
reference implementations — the same discipline as
``test_properties.py`` for the live operators."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from rs_query_engine_spark.operators.joins import asof_join_nearest
from rs_query_engine_spark.operators.layout import zorder_key
from rs_query_engine_spark.operators.sketches import (
    countmin_estimate,
    countmin_sketch,
)

KEYS = ("a", "b")

left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 40)), min_size=0, max_size=15
)
right_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 40)),
    min_size=0,
    max_size=15,
    unique_by=lambda t: (t[0], t[1]),  # right pre-deduped per (key, ts)
)


@pytest.fixture(scope="module")
def sp(spark):
    return spark


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=left_rows, rrows=right_rows, tol=st.sampled_from([0, 5, 40]))
def test_asof_nearest_matches_python_argmin(sp, lrows, rrows, tol):
    # ts in SECONDS (cast to timestamp), tolerance in seconds → µs
    ldf = sp.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lrows)] or [("zz", 0, -1)],
        "k string, lts long, lid long",
    ).withColumn("lts", F.col("lts").cast("timestamp"))
    rdf = sp.createDataFrame(
        [(k, t, float(t) * 2) for (k, t) in rrows] or [("zz", 99, 0.0)],
        "k string, rts long, rv double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    got = {
        r["lid"]: (r["matched_side"], r["dist_us"], r["rv"])
        for r in asof_join_nearest(
            ldf, rdf, by=["k"], left_ts="lts", right_ts="rts",
            tolerance_us=tol * 1_000_000,
        ).collect()
    }

    by_key: dict[str, list[tuple[int, float]]] = {}
    for k, t in rrows:
        by_key.setdefault(k, []).append((t, float(t) * 2))
    for i, (k, t) in enumerate(lrows):
        best = None
        for rt, rv in by_key.get(k, []):
            dist = abs(t - rt)
            if dist > tol:
                continue
            side = "b" if rt <= t else "f"
            key = (dist, 0 if side == "b" else 1)  # tie prefers backward
            if best is None or key < best[0]:
                best = (key, side, dist, rv)
        want = (
            (best[1], best[2] * 1_000_000, best[3]) if best else (None, None, None)
        )
        assert got[i] == want, f"left row {i} (k={k}, t={t}): {got[i]} != {want}"


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(x=st.integers(0, 255), y=st.integers(0, 255))
def test_zorder_key_bits_roundtrip(sp, x, y):
    # pure-Python Morton encode must agree with the Column expression
    z_expected = 0
    for i in range(8):
        z_expected |= ((x >> i) & 1) << (2 * i)
        z_expected |= ((y >> i) & 1) << (2 * i + 1)
    got = (
        sp.range(1)
        .select(zorder_key(F.lit(x), F.lit(y), bits=8).alias("z"))
        .collect()[0]["z"]
    )
    assert got == z_expected
    assert 0 <= got < 1 << 16


token_lists = st.lists(
    st.sampled_from(["w%d" % i for i in range(12)]), min_size=1, max_size=60
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=token_lists)
def test_countmin_never_underestimates_and_merges(sp, toks):
    df = sp.createDataFrame([(t,) for t in toks], "t string")
    sketch = countmin_sketch(df, "t", depth=3, width=8)  # narrow → collisions
    probes = df.select("t").distinct()
    est = {
        r["t"]: r["cm_est"]
        for r in countmin_estimate(sketch, probes, "t", depth=3, width=8).collect()
    }
    import collections

    exact = collections.Counter(toks)
    for t, n in exact.items():
        assert est[t] >= n, f"CM underestimated {t}: {est[t]} < {n}"
    # mergeability: split the stream in two, merge grids cell-wise,
    # estimates from the merged grid must be IDENTICAL
    half = len(toks) // 2
    a = sp.createDataFrame([(t,) for t in toks[:half]] or [("_",)], "t string")
    b = sp.createDataFrame([(t,) for t in toks[half:]] or [("_",)], "t string")
    sa = countmin_sketch(a, "t", depth=3, width=8)
    sb = countmin_sketch(b, "t", depth=3, width=8)
    merged = (
        sa.unionByName(sb).groupBy("row", "bucket").agg(F.sum("c").alias("c"))
    )
    if half > 0 and half < len(toks):
        est2 = {
            r["t"]: r["cm_est"]
            for r in countmin_estimate(
                merged, probes, "t", depth=3, width=8
            ).collect()
        }
        assert est2 == est
