"""Deterministic Lloyd's k-means (operators/cluster.py): numpy-twin
parity, partitioning invariance, the empty-cell carry rule, and the
diversity sampler's quota/determinism contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.operators.cluster import (
    diversity_sample,
    kmeans_lloyd,
)
from mrt_data_integration_spark.operators.dedup import release_cache
from mrt_data_integration_spark.sources import load_table


def _lloyd_np(X, ids, k, n_iter):
    """Local replica: same init (k lowest ids), same argmin tiebreak
    (numpy argmin returns the lowest index on ties), same empty-cell
    carry."""
    order = np.argsort(ids)
    C = X[order[:k]].astype(np.float64).copy()
    for _ in range(n_iter):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        cells = d.argmin(1)
        for i in range(k):
            m = cells == i
            if m.any():
                C[i] = X[m].mean(0)
    d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    return d.argmin(1), C


def test_kmeans_matches_numpy_twin(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([list(map(float, r.embedding)) for r in rows])

    assignments, centers = kmeans_lloyd(emb, k=8, n_iter=3)
    got = {r.vec_id: r.cell for r in assignments.collect()}
    release_cache(assignments)

    want_cells, want_C = _lloyd_np(X, ids, 8, 3)
    want = {int(i): int(c) for i, c in zip(ids, want_cells)}
    assert got == want
    np.testing.assert_allclose(np.array(centers), want_C, atol=1e-9)


def test_kmeans_invariant_to_partitioning(spark, sf_smoke):
    """Same clustering regardless of physical layout: the init is an
    id-ordered limit and every argmin/mean is layout-independent up to
    float summation order (assignments are integers — any drift would
    show here first)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    a1, c1 = kmeans_lloyd(emb, k=5, n_iter=2)
    r1 = sorted((r.vec_id, r.cell) for r in a1.collect())
    release_cache(a1)
    a2, c2 = kmeans_lloyd(emb.repartition(7), k=5, n_iter=2)
    r2 = sorted((r.vec_id, r.cell) for r in a2.collect())
    release_cache(a2)
    assert r1 == r2
    np.testing.assert_allclose(np.array(c1), np.array(c2), atol=1e-12)


def test_kmeans_empty_cell_keeps_centroid_and_ties_go_low(spark):
    """Duplicate seed vectors force an ALWAYS-empty cell (every point
    ties to the lower cell id): the empty cell must carry its previous
    centroid through every iteration, and the tiebreak must be the
    lowest cell id — the exact hand-computable walk asserted here."""
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [0.0]), (2, [5.0])],
        "vec_id long, embedding array<double>",
    )
    assignments, centers = kmeans_lloyd(df, k=2, n_iter=2)
    got = {r.vec_id: r.cell for r in assignments.collect()}
    release_cache(assignments)
    # iter1: all tie/assign to cell 0 -> c0=[5/3], c1 keeps [0]
    # iter2: v0,v1 -> c1 ([0] nearer), v2 -> c0 -> c0=[5], c1=[0]
    assert centers == [[5.0], [0.0]]
    assert got == {0: 1, 1: 1, 2: 0}


def test_kmeans_validates_inputs(spark):
    df = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds the corpus"):
        kmeans_lloyd(df, k=5, n_iter=1)
    with pytest.raises(ValueError, match="k must be"):
        kmeans_lloyd(df, k=0)
    with pytest.raises(ValueError, match="n_iter"):
        kmeans_lloyd(df, k=1, n_iter=-1)


def test_diversity_sample_quota_and_determinism(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    assignments, _ = kmeans_lloyd(emb, k=6, n_iter=2)
    sample = diversity_sample(assignments, per_cell=4)
    rows = sorted((r.cell, r.vec_id) for r in sample.collect())
    # quota: at most per_cell members per cell
    from collections import Counter

    counts = Counter(c for c, _ in rows)
    assert all(n <= 4 for n in counts.values())
    # subset of the assignment (cell, id) pairs
    universe = {
        (r.cell, r.vec_id) for r in assignments.collect()
    }
    assert set(rows) <= universe
    # deterministic under a different layout
    again = sorted(
        (r.cell, r.vec_id)
        for r in diversity_sample(
            assignments.repartition(5), per_cell=4
        ).collect()
    )
    release_cache(assignments)
    assert rows == again
    # the md5 rank picks the SAME ids a local replay picks
    import hashlib

    by_cell: dict[int, list[int]] = {}
    for c, i in sorted(universe):
        by_cell.setdefault(c, []).append(i)
    want = sorted(
        (c, i)
        for c, ids in by_cell.items()
        for i in sorted(
            ids,
            key=lambda x: (hashlib.md5(str(x).encode()).hexdigest(), x),
        )[:4]
    )
    assert rows == want


def test_assignment_kernel_chunked_path_matches_twin(spark):
    """Force the centroid-chunked kernel path (step < k requires
    n·d·k past the ~2^24-element budget: 10k rows × d=64 → step=26,
    k=30 → two blocks) and pin it against the unchunked numpy twin —
    chunking must change allocation only, never a distance or an
    argmin."""
    from mrt_data_integration_spark.operators.cluster import (
        _with_assignment,
    )

    n, d, k = 10_000, 64, 30
    rows = [
        (i, [float((i * 31 + j * 7) % 97) / 97.0 for j in range(d)])
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).coalesce(1)  # one partition → one Arrow batch ≥ the chunk budget
    centers = [
        [float((c * 13 + j * 3) % 89) / 89.0 for j in range(d)]
        for c in range(k)
    ]
    got = {
        r["vec_id"]: (r["cell"], r["__d__"])
        for r in _with_assignment(df, centers, "embedding")
        .select("vec_id", "cell", "__d__")
        .collect()
    }
    X = np.array([r[1] for r in rows])
    C = np.array(centers)
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
    cells = d2.argmin(1)
    for i in range(n):
        assert got[i][0] == cells[i]
        assert got[i][1] == d2[i, cells[i]]  # bit-identical, not approx
