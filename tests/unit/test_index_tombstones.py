"""Unit tests for the round-10 index lifecycle completion: LSH
tombstones + compaction (operators/lsh_index.py) and the persisted
IVF index with its delete path (operators/ivf_index.py) — the
semantic invariants the parity oracles can't state directly:

- delete-then-probe ≡ probe-of-compacted-index (LSM equivalence);
- the persisted IVF assignment is bit-identical to a fresh pass;
- partition-pruned reads of the list-partitioned assign table;
- tombstoned rows can never surface through a probe.

Reference analogue: the catalog register/lookup surface
(src/catalog.rs:16-42) — here extended to maintained artifacts with a
delete lifecycle the reference lacks."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rs_query_engine_spark.operators import ivf_index as iv
from rs_query_engine_spark.operators import lsh_index as li

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- LSH


def test_lsh_tombstones_cover_exactly_the_revoked_indexed_docs(spark):
    root = li.ensure_lsh_tombstones(spark, SF_DIR)
    tombs = li.read_tombstones(spark, root)
    # every tombstone is an indexed (non-batch) doc on the revoke rule
    bad = tombs.filter(
        (F.col("doc_id") % li.REVOKE_MOD != li.REVOKE_REM)
        | (F.col("doc_id") % li.BATCH_MOD == li.BATCH_REM)
    ).count()
    assert bad == 0
    expected = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(
            (F.col("doc_id") % li.BATCH_MOD != li.BATCH_REM)
            & (F.col("doc_id") % li.REVOKE_MOD == li.REVOKE_REM)
        )
        .count()
    )
    assert tombs.count() == expected > 0


def test_lsh_compaction_is_base_minus_tombstones(spark):
    base = li.ensure_lsh_index(spark, SF_DIR)
    comp = li.ensure_compacted_lsh_index(spark, SF_DIR)
    assert comp != base
    tombs = li.read_tombstones(spark, li.ensure_lsh_tombstones(spark, SF_DIR))
    for read in (li.read_index_bands, li.read_index_sigs):
        live = read(spark, base).join(tombs, "doc_id", "left_anti")
        got = read(spark, comp)
        assert got.count() == live.count()
        # symmetric difference empty (columns align by construction)
        assert got.exceptAll(live).count() == 0
        assert live.exceptAll(got).count() == 0
    # cached: second ensure returns the same installed root untouched
    mtime = os.path.getmtime(os.path.join(comp, "bands", "_SUCCESS"))
    assert li.ensure_compacted_lsh_index(spark, SF_DIR) == comp
    assert os.path.getmtime(os.path.join(comp, "bands", "_SUCCESS")) == mtime


def test_lsh_probe_with_tombstones_equals_probe_of_compacted(spark):
    """The LSM contract: honoring tombstones at probe time over the
    immutable base generations must give byte-identical admission
    decisions to probing the physically compacted index."""
    base = li.ensure_lsh_index(spark, SF_DIR)
    comp = li.ensure_compacted_lsh_index(spark, SF_DIR)
    tombs = li.read_tombstones(spark, li.ensure_lsh_tombstones(spark, SF_DIR))
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") % li.BATCH_MOD == li.BATCH_REM
    )
    a = li.probe_index(spark, base, batch, tombstones=tombs)
    b = li.probe_index(spark, comp, batch)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_lsh_delete_admits_docs_whose_only_dups_were_revoked(spark):
    """The observable point of a takedown: at least one batch doc
    flips from rejected to admitted once its matches are revoked (the
    sf0.001 corpus has seeded near-dup pairs crossing the revoke
    slice), and admission is monotone — deletes can only admit."""
    base = li.ensure_lsh_index(spark, SF_DIR)
    tombs = li.read_tombstones(spark, li.ensure_lsh_tombstones(spark, SF_DIR))
    batch = spark.read.parquet(f"{SF_DIR}/documents.parquet").filter(
        F.col("doc_id") % li.BATCH_MOD == li.BATCH_REM
    )
    before = {
        r["doc_id"]: r["admitted"] for r in li.probe_index(spark, base, batch).collect()
    }
    after = {
        r["doc_id"]: r["admitted"]
        for r in li.probe_index(spark, base, batch, tombstones=tombs).collect()
    }
    assert set(before) == set(after)
    regressed = [d for d in before if before[d] and not after[d]]
    assert regressed == []  # monotone: a delete never blocks admission
    flipped = [d for d in before if not before[d] and after[d]]
    assert flipped  # and the takedown actually freed someone


# ---------------------------------------------------------------- IVF


def test_ivf_assign_matches_fresh_assignment_and_types(spark):
    root = iv.ensure_ivf_index(spark, SF_DIR)
    assign = iv.read_ivf_assign(spark, root)
    assert dict(assign.dtypes)["centroid_id"] == "bigint"  # driver hash is type-sensitive
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    fresh = (
        iv.assign_centroids(e, iv.seed_centroids(e))
        .select("vec_id", F.col("centroid_id"))
    )
    diff = (
        assign.select("vec_id", "centroid_id")
        .exceptAll(fresh)
        .count()
    )
    assert diff == 0
    assert assign.count() == fresh.count() == e.count()


def test_ivf_assign_scan_is_partition_pruned(spark):
    """The point of partitionBy(centroid_id): a probe of nprobe lists
    must compile to a pruned scan, not a full read + filter."""
    root = iv.ensure_ivf_index(spark, SF_DIR)
    import re

    from rs_query_engine_spark.plans.explain import explain_str

    pruned = iv.read_ivf_assign(spark, root).filter(F.col("centroid_id").isin(1, 3))
    plan = explain_str(pruned)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip()  # non-empty partition filter list


def test_ivf_probe_equals_live_ivf_topk(spark):
    """The persisted index must answer identically to the
    recompute-per-query path it caches (similarity.ivf_topk over the
    same seed centroids)."""
    from rs_query_engine_spark.operators.similarity import ivf_topk

    root = iv.ensure_ivf_index(spark, SF_DIR)
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = iv.probe_ivf_index(spark, root, q, k=5, nprobe=2).select(
        "query_id", "vec_id", "rnk"
    )
    want = ivf_topk(e, iv.seed_centroids(e), q, k=5, nprobe=2).select(
        "query_id", "vec_id", "rnk"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ivf_probe_all_lists_equals_brute_force(spark):
    """Recall ceiling: with nprobe = N_SEED the probe scores every
    list, so the persisted-index answer must equal exact brute-force
    top-k — any divergence means the index dropped or duplicated
    corpus rows."""
    from rs_query_engine_spark.operators.similarity import brute_force_topk

    root = iv.ensure_ivf_index(spark, SF_DIR)
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = iv.probe_ivf_index(spark, root, q, k=5, nprobe=iv.N_SEED).select(
        "query_id", "vec_id", "rnk"
    )
    want = brute_force_topk(e, q, k=5).select("query_id", "vec_id", "rnk")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_ivf_merged_equals_full_rebuild(spark):
    """The merge contract stated by the oracle, pinned artifact-vs-
    artifact: base (corpus minus batch) + batch assigned against the
    PERSISTED centroids is exactly the full-corpus index — per-vector
    assignment independence under fixed centroids."""
    full = iv.read_ivf_assign(spark, iv.ensure_ivf_index(spark, SF_DIR)).select(
        "vec_id", "centroid_id"
    )
    merged = iv.read_ivf_merged_assign(
        spark, iv.ensure_merged_ivf_index(spark, SF_DIR)
    ).select("vec_id", "centroid_id")
    assert merged.count() == full.count()
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_ivf_probe_with_tombstones_never_returns_revoked(spark):
    root = iv.ensure_ivf_index(spark, SF_DIR)
    troot = iv.ensure_ivf_tombstones(spark, SF_DIR)
    tombs = iv.read_ivf_tombstones(spark, troot)
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    res = iv.probe_ivf_index(spark, root, q, k=5, nprobe=2, tombstones=tombs)
    leaked = res.join(tombs, "vec_id", "inner").count()
    assert leaked == 0
    # and equals a probe over the manually filtered assignment
    live = iv.read_ivf_assign(spark, root).join(tombs, "vec_id", "left_anti")
    assert res.count() > 0
    assert (
        res.select("query_id", "vec_id").join(live, "vec_id", "left_semi").count()
        == res.count()
    )
