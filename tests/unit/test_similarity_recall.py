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


def test_ivf_pq_adc_matches_numpy(spark):
    """IVF-PQ ADC scores must equal a from-scratch NumPy pipeline:
    same coarse assignment, same codes, same lookup-table sums."""
    import numpy as np

    from rs_query_engine_spark.operators.similarity import (
        ivf_pq_topk,
        pq_codebook,
    )

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, (40, 8)).round(3)
    corpus = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(4)],
        "centroid_id long, centroid_vec array<double>",
    )
    q = spark.createDataFrame(
        [(0, [float(x) for x in vecs[0]])], "query_id long, query_vec array<double>"
    )
    out = ivf_pq_topk(
        corpus, cent, q, 5, nprobe=2, num_sub=2, num_centroids=4, sub_dim=4
    ).collect()
    assert len(out) == 5

    # NumPy reference
    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    book = np.array(pq_codebook(2, 4, 4))
    cvecs = vecs[:4]
    assign = [
        max(range(4), key=lambda c: (cos(v, cvecs[c]), -c)) for v in vecs
    ]
    qsims = sorted(range(4), key=lambda c: (-cos(vecs[0], cvecs[c]), c))[:2]
    tables = [((book[b] - vecs[0].reshape(2, 4)[b]) ** 2).sum(axis=1) for b in range(2)]
    want = {}
    for i, v in enumerate(vecs):
        if assign[i] not in qsims:
            continue
        sv = v.reshape(2, 4)
        adc = 0.0
        for b in range(2):
            d = ((book[b] - sv[b]) ** 2).sum(axis=1)
            adc += tables[b][int(d.argmin())]
        want[i] = adc
    got = {r["vec_id"]: r["adc"] for r in out}
    for vid, adc in got.items():
        assert abs(want[vid] - adc) < 1e-9, (vid, want[vid], adc)
    # the returned 5 are the smallest ADC candidates
    top5 = sorted(want, key=lambda i: (want[i], i))[:5]
    assert sorted(got) == sorted(top5)
