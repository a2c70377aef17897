"""Bucket-size-cap tests for the LSH dedup family.

Degenerate inputs (every doc identical) put the whole corpus into one
bucket per band; without a cap the within-bucket pair expansion is
O(n²) on a single key. The cap must SKIP oversized buckets (emitting
nothing for them) and leave normal-sized buckets untouched.
"""

from __future__ import annotations

from rs_query_engine_spark.operators.dedup import (
    embedding_lsh_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)

N = 20
TEXT = "the quick brown fox jumps over the lazy dog again and again"


def _identical_docs(spark):
    return spark.createDataFrame(
        [(i, TEXT) for i in range(N)], "doc_id long, text string"
    )


def _identical_vecs(spark):
    return spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0]) for i in range(N)],
        "vec_id long, embedding array<double>",
    )


def test_simhash_cap_skips_degenerate_bucket(spark):
    docs = _identical_docs(spark)
    assert simhash_pairs(docs, "doc_id", "text", max_bucket=10).count() == 0


def test_simhash_under_cap_emits_all_pairs(spark):
    docs = _identical_docs(spark)
    out = simhash_pairs(docs, "doc_id", "text", max_bucket=1000)
    rows = out.collect()
    assert len(rows) == N * (N - 1) // 2
    assert all(r.hamming == 0 for r in rows)


def test_minhash_cap_skips_degenerate_bucket(spark):
    docs = _identical_docs(spark)
    assert (
        minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=10).count() == 0
    )


def test_minhash_under_cap_emits_all_pairs(spark):
    docs = _identical_docs(spark)
    out = minhash_lsh_pairs(docs, "doc_id", "text", max_bucket=1000)
    rows = out.collect()
    assert len(rows) == N * (N - 1) // 2
    assert all(abs(r.jaccard - 1.0) < 1e-12 for r in rows)


def test_embedding_cap_skips_degenerate_bucket(spark):
    vecs = _identical_vecs(spark)
    assert (
        embedding_lsh_pairs(vecs, "vec_id", "embedding", dim=8, max_bucket=10).count()
        == 0
    )


def test_embedding_under_cap_emits_all_pairs(spark):
    vecs = _identical_vecs(spark)
    out = embedding_lsh_pairs(vecs, "vec_id", "embedding", dim=8, max_bucket=1000)
    rows = out.collect()
    assert len(rows) == N * (N - 1) // 2
    assert all(abs(r.cos - 1.0) < 1e-12 for r in rows)
