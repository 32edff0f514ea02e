"""Connected-components correctness: differential vs a driver-side
union-find on randomized graphs, worst-case shapes (chains) that break
naive label propagation's round count, and cache hygiene."""

from __future__ import annotations

import random

import pytest

from mrt_data_integration_spark import cache_registry
from mrt_data_integration_spark.operators.components import connected_components


def _union_find(n_nodes: set[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {n: n for n in n_nodes}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            # always attach the larger root under the smaller, so every
            # root ends up the minimum member id of its component
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in n_nodes}


def _assign(
    spark, edges: list[tuple[int, int]], threshold: int = 200_000
) -> dict[int, int]:
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(
        df, driver_collect_threshold=threshold
    ).collect()
    return {int(r["node"]): int(r["component"]) for r in out}


# threshold 0 forces the distributed star loop; the default takes the
# driver union-find fast path — both must agree with the reference
@pytest.mark.parametrize("threshold", [0, 200_000])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graph_matches_union_find(spark, seed, threshold):
    rng = random.Random(seed)
    nodes = list(range(60))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(45)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    touched = {n for e in edges for n in e}
    expected = _union_find(touched, edges)
    got = _assign(spark, edges, threshold)
    assert got == expected


def test_chain_graph_converges_distributed(spark):
    """A 64-node chain needs 64 rounds under naive min-propagation but
    O(log n) under alternating star — converging inside max_iter on the
    FORCED distributed path proves we implemented the latter."""
    edges = [(i, i + 1) for i in range(63)]
    got = _assign(spark, edges, threshold=0)
    assert got == {i: 0 for i in range(64)}


def test_two_cliques_and_isolated_pair(spark):
    edges = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
        + [(100, 101)]
    )
    for threshold in (0, 200_000):
        got = _assign(spark, edges, threshold)
        assert {got[i] for i in range(5)} == {0}
        assert {got[i] for i in range(10, 14)} == {10}
        assert got[100] == got[101] == 100


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0


def test_self_loops_ignored(spark):
    got = _assign(spark, [(7, 7), (7, 9)])
    assert got == {7: 7, 9: 7}


def test_iteration_checkpoints_released_by_sweep(spark):
    cache_registry.sweep_caches()
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    # threshold=0 forces the distributed star loop — the driver fast
    # path creates no checkpoints at all (nothing to sweep by design)
    _assign(spark, [(i, i + 1) for i in range(20)], threshold=0)
    assert cache_registry.sweep_caches() > 0
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == baseline


def test_leakage_safe_split_clusters_never_straddle(spark):
    """The whole point: every member of a near-dup cluster lands in the
    SAME split; singletons hash their own id; boundaries honored."""
    from mrt_data_integration_spark.operators.components import (
        leakage_safe_split,
    )

    items = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # 40 clusters of 4 (chains), 40 singletons
    pairs = spark.createDataFrame(
        [
            (4 * c + j, 4 * c + j + 1)
            for c in range(40)
            for j in range(3)
        ],
        "id_a long, id_b long",
    )
    out = leakage_safe_split(items, pairs, "doc_id").collect()
    assert len(out) == 200
    by_comp = {}
    for r in out:
        by_comp.setdefault(r.component, set()).add(r.split)
    assert all(len(s) == 1 for s in by_comp.values()), "cluster straddled"
    # chain members share the min-id component
    comp = {r.doc_id: r.component for r in out}
    for c in range(40):
        assert {comp[4 * c + j] for j in range(4)} == {4 * c}
    # singletons are their own component
    for i in range(160, 200):
        assert comp[i] == i
    # all three splits appear over 80 components (statistically certain
    # for this fixed hash; pinned so a hash-arithmetic change screams)
    assert {r.split for r in out} == {"train", "val", "test"}


def test_leakage_safe_split_rejects_partial_boundaries(spark):
    """Boundaries that don't cover the 0-99 bucket range would leave
    rows with a NULL split (leaked out of every split) — fail loudly."""
    import pytest

    from mrt_data_integration_spark.operators.components import (
        leakage_safe_split,
    )

    items = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    with pytest.raises(ValueError, match="0-99"):
        leakage_safe_split(
            items, pairs, "doc_id",
            boundaries=[("train", 80), ("val", 90)],
        )
    with pytest.raises(ValueError, match="non-decreasing"):
        leakage_safe_split(
            items, pairs, "doc_id",
            boundaries=[("train", 90), ("val", 80), ("test", 100)],
        )


# --- quality-ranked canonical selection (late r12) -------------------


def test_select_canonical_quality_argmax_and_singletons(spark):
    """Winner = max quality per cluster, ties to the lowest id;
    documents outside every pair are singleton canonicals."""
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.operators.components import (
        select_canonical,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (4, 7), (9, 3)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    cc = connected_components(pairs, "id_a", "id_b")
    out = {
        r.doc_id: r
        for r in select_canonical(docs, cc, "n_chars").collect()
    }
    cache_registry.sweep_caches()
    assert len(out) == 5
    # cluster {1,2,3}: quality 50 tie between 2 and 3 -> lowest id (2)
    assert [out[i].is_canonical for i in (1, 2, 3)] == [
        False, True, False
    ]
    assert {out[i].component for i in (1, 2, 3)} == {1}
    # 4 and 9 are singletons: own component, canonical
    for i in (4, 9):
        assert out[i].component == i and out[i].is_canonical
    assert out[2].quality == 50 and out[4].quality == 7


def test_select_canonical_constant_quality_is_min_id_rule(spark):
    """With constant quality the argmax tie rule degenerates to the
    min-id convention — byte-identical to dedup_clusters' keeper."""
    import random as _r

    from pyspark.sql import functions as F

    from mrt_data_integration_spark.operators.components import (
        select_canonical,
    )

    rng = _r.Random(13)
    n = 40
    docs = spark.createDataFrame(
        [(i, 1) for i in range(n)], "doc_id long, n_chars long"
    )
    pairs = spark.createDataFrame(
        [
            (a, b)
            for a in range(n)
            for b in range(a + 1, n)
            if rng.random() < 0.05
        ],
        "id_a long, id_b long",
    )
    cc = connected_components(pairs, "id_a", "id_b")
    got = {
        r.doc_id: (r.component, r.is_canonical)
        for r in select_canonical(docs, cc, "n_chars").collect()
    }
    members = {r.node: r.component for r in cc.collect()}
    cache_registry.sweep_caches()
    for i in range(n):
        comp = members.get(i, i)
        assert got[i] == (comp, i == comp)


def test_select_canonical_null_quality_semantics(spark):
    """NULL-quality handling (ADVICE r12): is_canonical is always a
    non-NULL boolean; a NULL-quality row never beats a real quality;
    an all-NULL cluster still elects its min-id canonical."""
    from mrt_data_integration_spark.operators.components import (
        select_canonical,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, 50), (3, None), (4, None), (5, None), (9, None)],
        "doc_id long, n_chars long",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "id_a long, id_b long"
    )
    cc = connected_components(pairs, "id_a", "id_b")
    out = {
        r.doc_id: r
        for r in select_canonical(docs, cc, "n_chars").collect()
    }
    cache_registry.sweep_caches()
    assert len(out) == 6
    # every flag is a real boolean, never NULL
    assert all(isinstance(r.is_canonical, bool) for r in out.values())
    # cluster {1,2,3}: the only real quality (doc 2) wins
    assert [out[i].is_canonical for i in (1, 2, 3)] == [False, True, False]
    # all-NULL cluster {4,5}: min-id canonical, not a headless cluster
    assert [out[i].is_canonical for i in (4, 5)] == [True, False]
    # NULL-quality singleton is still its own canonical
    assert out[9].is_canonical and out[9].component == 9
    # the surfaced quality column keeps the raw (nullable) values
    assert out[2].quality == 50 and out[4].quality is None
