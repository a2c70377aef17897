"""Rotation-order guarantees for the driver's 50-row correctness
window (``queries.py:_rotation_order``).

The driver hashes only the first 50 ``queries()`` entries per round,
so the ordering IS the verification-coverage policy:

1. queries with no green driver row front-load (new registrations,
   regressions);
2. queries whose only green row was a rows-only ``no_oracle`` check
   but which NOW have an oracle registered also front-load — the hash
   check has never run for them (VERDICT r05 #2);
3. verified queries follow, oldest-green-first (staleness-aware).
"""

from rs_query_engine_spark import queries as registry


def test_unverified_and_newly_oracled_front_load():
    qs = {n: (lambda s, d: None) for n in ["a", "b", "c", "d"]}
    osql = {"a": "SELECT 1", "c": "SELECT 1", "d": "SELECT 1"}
    saved = (registry._GREEN_ROUND, registry._ROWS_ONLY_GREEN)
    try:
        # a: hash-green r2 → verified
        # b: rows-only green r4, still no oracle → verified (by design)
        # c: rows-only green r3, oracle NOW registered → UNVERIFIED
        # d: no driver row at all → UNVERIFIED
        registry._GREEN_ROUND = {"a": 2, "b": 4, "c": 3}
        registry._ROWS_ONLY_GREEN = {"b", "c"}
        order = registry._rotation_order(qs, osql)
        assert order == ["c", "d", "a", "b"]
    finally:
        registry._GREEN_ROUND, registry._ROWS_ONLY_GREEN = saved


def test_verified_ordering_is_oldest_green_first_then_registration():
    qs = {n: (lambda s, d: None) for n in ["x", "y", "z"]}
    saved = (registry._GREEN_ROUND, registry._ROWS_ONLY_GREEN)
    try:
        registry._GREEN_ROUND = {"x": 5, "y": 1, "z": 5}
        registry._ROWS_ONLY_GREEN = set()
        assert registry._rotation_order(qs, {}) == ["y", "x", "z"]
    finally:
        registry._GREEN_ROUND, registry._ROWS_ONLY_GREEN = saved


def test_live_window_front_loads_round6_targets():
    # the real registry, real driver artifacts: the 4 queries that
    # gained oracles in round 5 plus all 20 staged activations must
    # sit inside the first 50 rotation slots.
    names = list(registry.queries())[:50]
    for n in [
        "agg_freq_items",
        "agg_hll_sketch_merge",
        "similarity_ivf_pq_topk",
        "agg_approx_distinct",
        "sample_split_assign",
        "join_asof_nearest",
        "agg_countmin_heavy",
    ]:
        assert n in names, n
    # the stalest verified rows (r01 multimodal pair) must also make
    # the window — the staged front-load may not evict them.
    assert "multimodal_byte_stats" in names
    assert "multimodal_frame_sample" in names


def test_r7_activation_front_loads_staged_queries():
    # round-7 rehearsal: flipping STAGED_R7_ENABLED must merge the r7
    # pen into the registry AND front-load every r7 name into the
    # driver's 50-row window (they have no driver row yet)
    from rs_query_engine_spark import queries_staged_r7 as r7

    saved = registry.STAGED_R7_ENABLED
    try:
        registry.STAGED_R7_ENABLED = True
        names = list(registry.queries())
        window = set(names[:50])
        for n in r7.queries():
            assert n in window, n
        assert set(registry.oracle_sql()) >= set(r7.oracle_sql())
    finally:
        registry.STAGED_R7_ENABLED = saved
    assert not set(r7.queries()) & set(registry.queries())
