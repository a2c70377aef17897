"""Semantic tests for the round-7 staged queries — properties the
oracle hash can't express directly (partition-function invariants,
rank monotonicity), on the real corpus at sf0.001.
"""

from __future__ import annotations

from rs_query_engine_spark import queries_staged_r7 as r7

SF_DIR = "/root/testdata/sf0.001"


def test_training_shards_partition_every_doc_exactly_once(spark):
    res = r7.layout_training_shards(spark, SF_DIR).collect()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert len(res) == docs.count()
    assert len({r["doc_id"] for r in res}) == len(res)
    # positions are contiguous 1..n within every shard (a gap would
    # mean the data loader skips or double-reads an index)
    by_shard: dict[int, list[int]] = {}
    for r in res:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # the salted hash spreads docs across all shards
    assert len(by_shard) == r7._N_SHARDS


def test_training_shards_reproducible(spark):
    a = sorted(map(tuple, r7.layout_training_shards(spark, SF_DIR).collect()))
    b = sorted(map(tuple, r7.layout_training_shards(spark, SF_DIR).collect()))
    assert a == b


def test_hybrid_rrf_ranks_are_dense_and_scores_monotone(spark):
    rows = r7.similarity_hybrid_rrf(spark, SF_DIR).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1)), qid
        assert len(rs) <= r7._HYBRID_TOPK
        # rrf strictly ordered by (score desc, doc_id) — the window's
        # total order means scores never increase with rank
        for a, b in zip(rs, rs[1:]):
            assert a["rrf"] > b["rrf"] or (
                a["rrf"] == b["rrf"] and a["doc_id"] < b["doc_id"]
            ), qid
        # every query retrieves its own document somewhere in the pool
        assert any(r["doc_id"] == qid for r in rs), qid


def test_exact_substr_fraction_bounded(spark):
    rows = r7.text_exact_substr_fraction(spark, SF_DIR).collect()
    for r in rows:
        assert 0.0 <= r["dup_frac"] <= 1.0
        assert r["dup_chars"] <= r["doc_len"]
