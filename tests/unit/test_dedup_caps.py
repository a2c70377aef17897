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


def test_containment_detects_asymmetric_subset(spark):
    """A short doc quoted inside a much longer one must surface as a
    containment pair (short ⊆ long) even though its Jaccard is far
    below any near-dup threshold — the case symmetric dedup misses."""
    from rs_query_engine_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    quote = " ".join(f"tok{i}" for i in range(20))
    filler = " ".join(f"pad{i}" for i in range(200))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote)],
        "doc_id long, text string",
    )
    rows = containment_pairs(docs, "doc_id", "text").collect()
    got = {(r.id_a, r.id_b): r.containment for r in rows}
    assert (1, 2) in got and got[(1, 2)] >= 0.8
    # the long doc is NOT contained in the short one
    assert (2, 1) not in got
    # and symmetric Jaccard at its default threshold misses the pair
    assert (
        ngram_jaccard_pairs(docs, "doc_id", "text").filter("jaccard >= 0.3").count()
        == 0
    )


def test_containment_df_cap_drops_stop_shingles(spark):
    """With max_df below the corpus size, a shingle shared by every
    doc must not generate candidates — identical docs produce zero
    pairs when every shingle is over the cap."""
    from rs_query_engine_spark.operators.dedup import containment_pairs

    docs = _identical_docs(spark)
    assert containment_pairs(docs, "doc_id", "text", max_df=10).count() == 0
    # under the cap the mutual containments appear (both directions)
    out = containment_pairs(docs, "doc_id", "text", max_df=1000)
    assert out.count() == N * (N - 1)


def test_containment_rejects_underprovisioned_probe_frac(spark):
    """probe_frac < 1 - threshold breaks the pigeonhole exactness
    guarantee — must raise instead of silently losing recall."""
    import pytest

    from rs_query_engine_spark.operators.dedup import containment_pairs

    docs = _identical_docs(spark)
    with pytest.raises(ValueError, match="probe_frac"):
        containment_pairs(docs, "doc_id", "text", threshold=0.7, probe_frac=0.2)
    # exactly-provisioned pairing is accepted
    containment_pairs(docs, "doc_id", "text", threshold=0.7, probe_frac=0.3)


def test_semantic_dedup_drops_within_cluster_near_dups(spark):
    """Hand-built geometry: two clusters along orthogonal axes; vectors
    1 and 2 are near-identical (cos ~1) in cluster A, vector 3 is in
    cluster B. Keep-smallest-id drops 2, keeps 1 and 3; a cross-cluster
    near-dup (vector 4 ~ vector 3 but assigned to A's centroid? no —
    orthogonal) stays kept."""
    from rs_query_engine_spark.operators.dedup import semantic_dedup

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "centroid_id long, centroid_vec array<double>",
    )
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.01, 0.0]),   # cluster 0
            (2, [1.0, 0.011, 0.0]),  # cluster 0, near-dup of 1 -> dropped
            (3, [0.0, 1.0, 0.02]),   # cluster 1
            (4, [0.02, 1.0, -0.9]),  # cluster 1, far from 3 -> kept
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["vec_id"]: (r["centroid_id"], r["kept"])
        for r in semantic_dedup(vecs, cents, threshold=0.95).collect()
    }
    assert out == {1: (0, True), 2: (0, False), 3: (1, True), 4: (1, True)}
