"""Deterministic distributed Lloyd's k-means and cluster-keyed corpus
curation (diversity sampling).

The IVF/PQ family (operators/similarity.py) already clusters — but as
an INDEX build, through pyspark.ml KMeans: seeded, k-means||
initialized, not replayable outside Spark. Curation decisions need the
opposite trade: a clustering an external engine can AUDIT step by
step. This module runs fixed-iteration Lloyd's with a replayable
recipe — init = the ``k`` lowest-id vectors, assignment = nearest
centroid with ties to the lowest cell id, re-estimation = ``d``
element-wise ``avg`` aggregates (JVM codegen) — so the DuckDB oracle
replays every iteration as an unrolled CTE (the PageRank precedent,
graph.py:81).

The assignment kernel is a vectorized Arrow-batched numpy UDF, chosen
ON MEASUREMENT over two expression forms built first: k×d unrolled
literal argmin expressions (plan compilation dominated — the lesson
similarity.py's PQ encoding history records) and a broadcast-row
``zip_with``/``aggregate`` fold (HOF lambdas evaluate interpreted,
~60 µs/row at k=8, d=64 — see :func:`_with_assignment`). Dense
batched linear algebra is the one place the built-ins genuinely can't
express the work cheaply.

Why it scales: each iteration is ONE scan of the (persisted) feature
frame; the assignment is map-side (centroids ride the closure,
bounded by config), and the re-estimation's shuffle carries k×(d+1)
partial rows per task (partial aggregation collapses map-side), never
data rows. Driver state is k×d floats per iteration — bounded by
config, not data. n_iter is FIXED (curation wants reproducibility,
not convergence chasing — SemDeDup uses a handful of iterations).

Cluster-based curation is the consumer: SemDeDup (Abbas et al. 2023)
dedups within cells; DataComp-style selection (Gadre et al. 2023)
samples across cells for diversity. :func:`diversity_sample` is the
latter: a deterministic per-cell quota by md5 rank, so the sample is
stable across engines, partitionings, and corpus growth.

Reference basis: the reference repo (R statistics) has no clustering;
this extends the engine's LLM-data-pipeline surface (SURVEY.md §2
E-series) alongside similarity.py's SemDeDup half.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.cache_registry import attach_cache, track_cache


def _with_assignment(
    feats: DataFrame, centers: list[list[float]], vec_col: str
) -> DataFrame:
    """feats + (__d__, cell) under ``centers``: a vectorized
    Arrow-batched kernel, NOT an expression fold.

    This is the module's one deliberate Python hot loop. The
    expression form (zip_with/aggregate argmin over a broadcast
    centroid row) was built first and measured: Spark HOF lambdas
    evaluate interpreted — never codegen — and at k=8, d=64 the argmin
    costs ~4k lambda evaluations per row (~60 µs/row steady-state,
    ~2 ms/row/core). The numpy kernel does the identical arithmetic as
    one (batch × k × d) broadcast subtraction per Arrow batch —
    per-row cost drops ~2 orders of magnitude, exactly the
    "Arrow-batched Pandas UDF when the built-ins can't express it
    cheaply" rule. Centroids ride the closure (k×d float64 — bounded
    by config; ~0.5 MB even at k=1024, d=64).

    Oracle compatibility: distances are double; numpy's axis-sum order
    differs from DuckDB's sequential ``list_distance`` fold at the
    ~1e-16 relative level, argmin ties break to the LOWEST cell id in
    both (np.argmin / ORDER BY d, cell), and inter-centroid gaps on
    real embeddings dwarf the noise — the hash oracle validates this
    end-to-end at three SFs."""
    C = np.asarray(
        [[float(x) for x in c] for c in centers], dtype=np.float64
    )

    @F.pandas_udf("d double, cell long")
    def best(v: pd.Series) -> pd.DataFrame:
        if len(v) == 0:
            return pd.DataFrame({"d": [], "cell": []}).astype(
                {"d": "float64", "cell": "int64"}
            )
        X = np.stack(v.to_numpy()).astype(np.float64, copy=False)
        n, d = X.shape
        # Chunk the centroid axis so the (batch × chunk × d) broadcast
        # temporary stays ~128 MB regardless of k: at k=1024, d=64 the
        # unchunked 3-D temp is ~5 GB per 10k-row Arrow batch — an
        # executor OOM at exactly the k the closure-size budget calls
        # safe. Element-wise arithmetic (and therefore every distance
        # and the argmin) is bit-identical to the unchunked form; only
        # the allocation is bounded.
        step = max(1, (1 << 24) // max(n * d, 1))
        d2 = np.empty((n, C.shape[0]), dtype=np.float64)
        for s in range(0, C.shape[0], step):
            block = C[s : s + step]
            # square IN PLACE: `(diff ** 2)` would hold the diff tensor
            # AND the squared tensor live at once — 2× the budgeted
            # temporary (same elementwise ops, so still bit-identical)
            t = X[:, None, :] - block[None, :, :]
            np.square(t, out=t)
            d2[:, s : s + len(block)] = t.sum(-1)
        cell = d2.argmin(1)
        return pd.DataFrame(
            {
                "d": d2[np.arange(len(cell)), cell],
                "cell": cell.astype("int64"),
            }
        )

    # asNondeterministic: the function IS deterministic, but the marker
    # stops the optimizer from DUPLICATING it (guide §4.4) — consumers
    # that filter on an extracted struct field (e.g. the inner join on
    # `cell` in semantic_decontamination_ivf pushes isnotnull(cell)
    # below the projection) otherwise get TWO ArrowEvalPython nodes,
    # each paying the full (batch × k × d) distance kernel (measured:
    # ops 21+24 in plans/r14/semantic_decontamination_ivf_before.txt).
    b = best.asNondeterministic()(F.col(vec_col)).alias("__best__")
    return (
        feats.withColumn("__best__", b)
        .withColumn("__d__", F.col("__best__.d"))
        .withColumn("cell", F.col("__best__.cell"))
        .drop("__best__")
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, list[list[float]]]:
    """Fixed-iteration deterministic Lloyd's k-means.

    Init: the ``k`` smallest-``id_col`` rows' vectors, in id order
    (cell i = i-th smallest id) — no RNG, so two engines (and two
    runs) build the same clustering. Each iteration assigns every
    vector to its nearest centroid (map-side argmin against the
    broadcast centroid row) and re-estimates each centroid as the
    element-wise mean of its members (``d`` avg aggregates — one light
    shuffle of k×(d+1) partials per task). A cell with no members
    keeps its previous centroid (deterministic, documented — mirrors
    what the unrolled SQL replay's left join + coalesce does).

    Returns ``(assignments, centers)``: assignments =
    (id_col, vec_col as array<double>, cell, dist) under the FINAL
    centers, ``dist`` the rooted L2 distance to the owning centroid
    (== DuckDB ``list_distance``); centers = the final k×d list. The
    feature frame is persisted for the loop's n_iter+1 scans; the
    returned frame carries the cache handle (release via
    operators.dedup.release_cache — the same discipline as the dedup
    family).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if n_iter < 0:
        raise ValueError(f"n_iter must be >= 0, got {n_iter}")
    # NULL vectors are excluded up front (a row with no position in
    # the space cannot be assigned; leaving it in would crash the
    # Arrow kernel's np.stack mid-task with an opaque worker error).
    feats = track_cache(
        df.filter(F.col(vec_col).isNotNull())
        .select(
            F.col(id_col),
            F.col(vec_col).cast("array<double>").alias(vec_col),
        )
        .persist()
    )
    seeds = feats.orderBy(id_col).limit(k).collect()  # bounded: k rows
    if len(seeds) < k:
        raise ValueError(f"k={k} exceeds the corpus size {len(seeds)}")
    centers = [list(map(float, r[vec_col])) for r in seeds]
    d = len(centers[0])
    for _ in range(n_iter):
        assigned = _with_assignment(feats, centers, vec_col)
        stats = assigned.groupBy("cell").agg(
            *[
                F.avg(F.element_at(F.col(vec_col), i + 1)).alias(f"m{i}")
                for i in range(d)
            ]
        ).collect()  # bounded: <= k rows of d doubles
        by_cell = {int(r["cell"]): r for r in stats}
        centers = [
            [float(by_cell[i][f"m{j}"]) for j in range(d)]
            if i in by_cell
            else centers[i]  # empty cell: keep previous centroid
            for i in range(k)
        ]
    assignments = (
        _with_assignment(feats, centers, vec_col)
        .withColumn("dist", F.sqrt(F.col("__d__")))
        .drop("__d__")
    )
    return attach_cache(assignments, [feats]), centers


def diversity_sample(
    assignments: DataFrame,
    per_cell: int,
    id_col: str = "vec_id",
    cell_col: str = "cell",
) -> DataFrame:
    """Per-cell quota sample: the ``per_cell`` members of each cluster
    with the smallest ``md5(id)`` — deterministic across engines,
    partitionings, and corpus growth (a doc keeps or loses its slot
    only if the md5 order inside ITS cell changes), the same
    hex-threshold discipline as the stratified samplers
    (queries/pipeline.py). One window per cell keyed by the cell id;
    the rank filter is pushdown-eligible (rank <= K, no OR)."""
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy(cell_col).orderBy(
            F.md5(F.col(id_col).cast("string")), F.col(id_col)
        )
    )
    return (
        assignments.select(cell_col, id_col)
        .withColumn("__rn__", rn)
        .filter(F.col("__rn__") <= per_cell)
        .drop("__rn__")
    )
