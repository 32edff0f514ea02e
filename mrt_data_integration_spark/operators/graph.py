"""Iterative graph ranking (PageRank power iteration) over an edge
DataFrame — the third iterative shape in the engine after the
alternating-star connected components (operators/components.py) and the
BPE merge loop (operators/tokenizer.py), and the first whose iteration
is a pure plan-to-plan transformation with NO per-round driver collect
(k-means and BPE both collect an O(1) argmax per round; PageRank's only
driver scalar is the one-time node count).

Use in a training-data pipeline: rank documents by centrality in the
near-duplicate graph (edges = LSH/Jaccard near-dup pairs) to pick the
canonical representative per duplicate neighborhood, or rank
hosts/sources by propagated quality — the Common Crawl host-ranking
pattern (Nagel et al.'s harmonic-centrality ranking is the public
reference point; PageRank is the standard power-iteration analogue,
Page et al. 1999).

Scale design (100 TB):
- one iteration = one (rank ⋈ out-weighted edges) shuffle on the edge
  key + one groupBy(dst) partial-agg shuffle — both keyed shuffles AQE
  can size; the edge table (joined with out-degrees ONCE, up front) is
  persisted and re-used every round, never recomputed;
- dangling mass (rank parked on nodes with no out-edges) is collected
  as a ONE-ROW aggregate and redistributed via crossJoin — a 1-row
  broadcast, not a driver round-trip;
- every iteration ends in ``localCheckpoint(eager=True)``: the logical
  plan would otherwise nest one join per round and planning cost grows
  super-linearly (the lineage-explosion failure mode of iterative
  DataFrame algorithms). Local checkpoints tie the blocks to executor
  lifetime — on a production cluster with dynamic allocation use a
  reliable ``checkpoint()`` dir instead; the trade is documented at the
  call site, and old iterations' blocks are reclaimed by Spark's
  ContextCleaner once unreferenced;
- fixed ``iterations`` (no convergence collect): deterministic output,
  and the whole run is expressible as chained SQL CTEs — which is
  exactly how the DuckDB oracle replays it (queries/graph.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def _edge_tables(edges: DataFrame, src: str, dst: str):
    """Build the two tables every PageRank round reuses.

    ``outdeg`` is persisted because the dangling-mass anti-join probes
    it every iteration — without the persist each round would re-run
    the edges groupBy.

    ``ew`` (out-degree folded into the edge table ONCE) is
    pre-partitioned on the per-round join key BEFORE persisting: the
    cached InMemoryRelation then REPORTS hashpartitioning(__esrc__), so
    every iteration's ranks-join reuses it and only the (small,
    fresh-each-round) ranks side shuffles — one exchange per round on
    the edge table would otherwise re-move the 100 TB side every
    iteration (the r7 SCALING_CURVE note; plan pinned by
    tests/test_graph.py::test_pagerank_round_join_is_exchange_free_on_edges).
    ``repartition`` numPartitions defaults to
    spark.sql.shuffle.partitions, matching the join's requirement.
    """
    outdeg = (
        edges.groupBy(src)
        .agg(F.count(F.lit(1)).alias("__outdeg__"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ew = (
        edges.join(outdeg, on=src)
        .select(
            F.col(src).alias("__esrc__"),
            F.col(dst).alias("__edst__"),
            "__outdeg__",
        )
        .repartition(F.col("__esrc__"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return ew, outdeg


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iterations: int = 6,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
) -> DataFrame:
    """Power-iteration PageRank over directed ``edges``, returning one
    row per node in ``nodes`` with its rank after ``iterations`` rounds.

    ``nodes`` must contain every edge endpoint (it MAY contain more —
    isolated nodes are dangling and receive teleport + redistributed
    dangling mass). Rank update per round, the standard form:

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u) + DM/N)

    where DM is the total rank parked on dangling (no-out-edge) nodes.
    Total rank mass is conserved at 1 every round (asserted in tests).
    """
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    n = nodes.count()  # one bounded driver scalar (the only collect)
    if n == 0:
        return nodes.select(
            F.col(node_col), F.lit(0.0).alias("rank")
        )
    ew, outdeg = _edge_tables(edges, src, dst)
    base = nodes.select(F.col(node_col).alias("__node__")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    ranks = base.withColumn("__rank__", F.lit(1.0 / n))
    try:
        for _ in range(iterations):
            contrib = (
                ranks.join(ew, ranks["__node__"] == ew["__esrc__"])
                .groupBy("__edst__")
                .agg(
                    F.sum(F.col("__rank__") / F.col("__outdeg__")).alias(
                        "__c__"
                    )
                )
            )
            # rank parked on dangling nodes: 1-row aggregate,
            # redistributed to everyone via a 1-row crossJoin broadcast
            dangling = (
                ranks.join(
                    outdeg, ranks["__node__"] == outdeg[src], "left_anti"
                )
                .agg(F.coalesce(F.sum("__rank__"), F.lit(0.0)).alias("__dm__"))
            )
            ranks = (
                base.join(
                    contrib,
                    F.col("__node__") == F.col("__edst__"),
                    "left",
                )
                .crossJoin(dangling)
                .select(
                    "__node__",
                    (
                        F.lit((1.0 - damping) / n)
                        + F.lit(damping)
                        * (
                            F.coalesce(F.col("__c__"), F.lit(0.0))
                            + F.col("__dm__") / F.lit(float(n))
                        )
                    ).alias("__rank__"),
                )
                # truncate lineage: without this the plan nests one
                # join per iteration and planning blows up
                .localCheckpoint(eager=True)
            )
    finally:
        ew.unpersist()
        outdeg.unpersist()
        base.unpersist()
    return ranks.select(
        F.col("__node__").alias(node_col), F.col("__rank__").alias("rank")
    )
