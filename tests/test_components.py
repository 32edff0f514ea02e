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
