"""Connected-components unit tests: exact components on hand-built
graphs (chain, two components, self-contained convergence)."""

from __future__ import annotations

from rs_query_engine_spark.operators.graph import connected_components, dedup_clusters


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {
        r["node"]: r["comp"] for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_converges_past_one_hop(spark):
    # a long chain needs multiple propagation rounds
    got = _cc(spark, [(i, i + 1) for i in range(1, 9)])
    assert got == {i: 1 for i in range(1, 10)}


def test_cluster_sizes(spark):
    df = spark.createDataFrame([(5, 9), (9, 7), (2, 3)], "id_a long, id_b long")
    rows = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in dedup_clusters(df).collect()}
    assert rows == {5: (5, 3), 9: (5, 3), 7: (5, 3), 2: (2, 2), 3: (2, 2)}


def test_bfs_levels_minimal_distance_and_depth_bound(spark):
    from rs_query_engine_spark.operators.graph import bfs_levels

    # chain 1-2-3-4-5-6 plus a shortcut 1-4: node 4 is reached at
    # dist 1 via the shortcut (not 3 via the chain); 6 is at dist 3
    # via the shortcut; depth bound 2 must exclude it.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 4)],
        "id_a long, id_b long",
    )
    seeds = spark.createDataFrame([(1,), (99,)], "doc_id long")  # 99 isolated
    got = {
        r["node"]: r["dist"]
        for r in bfs_levels(edges, seeds, max_depth=3).collect()
    }
    assert got == {1: 0, 99: 0, 2: 1, 4: 1, 3: 2, 5: 2, 6: 3}
    bounded = {
        r["node"]: r["dist"]
        for r in bfs_levels(edges, seeds, max_depth=2).collect()
    }
    assert bounded == {1: 0, 99: 0, 2: 1, 4: 1, 3: 2, 5: 2}
