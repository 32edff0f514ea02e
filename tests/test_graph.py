"""PageRank power iteration (operators/graph.py): distributed result
vs a dense numpy twin implementing the identical update, dangling-mass
conservation, isolated-node handling, and the lineage-truncation
contract that makes the iteration survive many rounds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.graph import pagerank


def _numpy_pagerank(n, edge_list, iterations, damping):
    """Dense twin: same update formula, same iteration count."""
    outdeg = np.zeros(n)
    for s, _ in edge_list:
        outdeg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edge_list:
            contrib[d] += r[s] / outdeg[s]
        dm = r[outdeg == 0].sum()
        r = (1.0 - damping) / n + damping * (contrib + dm / n)
    return r


def _run(spark, n, edge_list, iterations=6, damping=0.85):
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node long")
    got = {
        r.node: r.rank
        for r in pagerank(
            edges, nodes, iterations=iterations, damping=damping
        ).collect()
    }
    want = _numpy_pagerank(n, edge_list, iterations, damping)
    return got, want


def test_pagerank_matches_numpy_twin_random_graph(spark):
    rng = np.random.default_rng(7)
    n = 60
    edge_list = list(
        {
            (int(a), int(b))
            for a, b in rng.integers(0, n, size=(300, 2))
            if a != b
        }
    )
    got, want = _run(spark, n, edge_list, iterations=8)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)
    # mass conservation: the update redistributes all rank every round
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_dangling_and_isolated_nodes(spark):
    """A chain into a dangling sink plus two isolated nodes: the sink
    accumulates, the danglers' mass returns via DM/N, and the isolated
    nodes end EXACTLY at teleport + dangling share (equal to each
    other, strictly below any node with in-edges)."""
    # 0 -> 1 -> 2 (2 dangles); 3, 4 isolated
    got, want = _run(spark, 5, [(0, 1), (1, 2)], iterations=6)
    for i in range(5):
        assert got[i] == pytest.approx(want[i], abs=1e-14)
    assert got[3] == got[4]
    assert got[2] > got[1] > got[3]


def test_pagerank_no_edges_all_teleport(spark):
    """Edge-free graph: every node is dangling, every round returns the
    full mass as teleport + DM/N = 1/N exactly (fixed point)."""
    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(4)], "node long")
    got = {r.node: r.rank for r in pagerank(edges, nodes, iterations=3).collect()}
    for v in got.values():
        assert v == pytest.approx(0.25, abs=1e-15)


def test_pagerank_validates_iterations(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    nodes = spark.createDataFrame([(0,)], "node long")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(edges, nodes, iterations=0)


def test_pagerank_lineage_is_truncated(spark):
    """The returned plan must read the LAST checkpoint, not replay all
    iterations: without localCheckpoint the logical plan nests one join
    per round and planning cost explodes with the iteration count. An
    ExistingRDD scan with zero joins in the final plan IS the truncation
    proof."""
    edges = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    nodes = spark.createDataFrame([(0,), (1,)], "node long")
    out = pagerank(edges, nodes, iterations=5)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan, plan
    assert "Join" not in plan, plan


def test_pagerank_round_join_is_exchange_free_on_edges(spark):
    """The per-round ranks⋈edges join must NOT re-shuffle the edge
    table (the 100 TB side): _edge_tables pre-partitions + persists it
    on __esrc__, so the cached partitioning satisfies the join's
    requirement and only the fresh-each-round ranks side exchanges.
    Pinned with broadcast off — at scale neither side is broadcastable,
    SMJ/SHJ is the real plan."""
    from mrt_data_integration_spark.operators.graph import _edge_tables

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.range(500).select(
            (F.col("id") % 97).alias("src"), (F.col("id") % 53).alias("dst")
        )
        ew, outdeg = _edge_tables(edges, "src", "dst")
        try:
            ew.count()  # materialize the cache, as the first round does
            ranks = (
                spark.range(97)
                .select(
                    F.col("id").alias("__node__"),
                    F.lit(1.0 / 97).alias("__rank__"),
                )
                .localCheckpoint()  # the loop's ranks are checkpointed
            )
            contrib = (
                ranks.join(ew, ranks["__node__"] == ew["__esrc__"])
                .groupBy("__edst__")
                .agg(
                    F.sum(F.col("__rank__") / F.col("__outdeg__")).alias("__c__")
                )
            )
            plan = contrib._jdf.queryExecution().executedPlan().toString()
            # only inspect the TOP-LEVEL join section: the cached
            # relation prints its own build plan (which legitimately
            # contains the one-time repartition exchange) below the
            # first InMemoryRelation marker
            top = plan.split("InMemoryRelation", 1)[0]
            assert "InMemoryTableScan" in top, top
            assert "Exchange hashpartitioning(__esrc__" not in top, top
            assert "Exchange hashpartitioning(__node__" in top, top
        finally:
            ew.unpersist()
            outdeg.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
