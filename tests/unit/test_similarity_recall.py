"""Recall gates for the approximate similarity path (IVF).

Approximate operators need a measured quality bound, not just row
parity: these tests compute recall@10 against the exact brute-force
baseline and pin (a) an absolute floor and (b) the nprobe ordering —
probing more lists must never lose recall. Measured on this corpus:
nprobe=1 ≈ 0.44, nprobe=2 ≈ 0.60, k-means+nprobe=2 ≈ 0.56.
"""

from __future__ import annotations

import pytest

from rs_query_engine_spark import queries as registry

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def truth(spark):
    df = registry.queries()["similarity_bruteforce_topk"](spark, SF_DIR)
    return {(r.query_id, r.vec_id) for r in df.collect()}


def _recall(spark, name: str, truth) -> float:
    got = {
        (r.query_id, r.vec_id)
        for r in registry.queries()[name](spark, SF_DIR).collect()
    }
    return len(truth & got) / len(truth)


def test_probed_recall_floor(spark, truth):
    assert _recall(spark, "similarity_ivf_probed", truth) >= 0.5


def test_kmeans_recall_floor(spark, truth):
    assert _recall(spark, "similarity_ivf_kmeans", truth) >= 0.4


def test_nprobe_monotone(spark, truth):
    r1 = _recall(spark, "similarity_ivf_topk", truth)
    r2 = _recall(spark, "similarity_ivf_probed", truth)
    assert r2 >= r1, f"nprobe=2 recall {r2} < nprobe=1 recall {r1}"


def test_pq_codes_match_numpy_argmin(spark):
    """PQ codes and reconstruction error must equal a from-scratch
    NumPy recomputation over the same deterministic codebook."""
    import numpy as np

    from rs_query_engine_spark.operators.similarity import pq_codebook, pq_codes

    rng = [[(i * 7 + j * 3) % 10 / 10.0 - 0.5 for j in range(8)] for i in range(6)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<double>"
    )
    out = {
        r["_id"]: r
        for r in pq_codes(
            df, "vec_id", "embedding", num_sub=2, num_centroids=4, sub_dim=4
        ).collect()
    }
    book = np.array(pq_codebook(2, 4, 4))  # [sub][centroid][dim]
    for i, v in enumerate(rng):
        vv = np.array(v).reshape(2, 4)
        want_codes, want_err = [], 0.0
        for b in range(2):
            d = ((book[b] - vv[b]) ** 2).sum(axis=1)
            want_codes.append(int(d.argmin()))
            want_err += d.min()
        got = out[i]
        assert [int(c) for c in got["codes"].split(",")] == want_codes
        assert abs(got["recon_err"] - want_err) < 1e-12
