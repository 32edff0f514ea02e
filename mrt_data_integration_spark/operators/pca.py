"""Distributed PCA over embedding columns — one-pass moment collapse +
driver-side eigendecomposition + map-side projection.

The curation consumers (SemDeDup cells, k-means diversity cells,
cosine near-dup thresholds) all behave better on decorrelated /
variance-ordered coordinates; PCA (optionally whitened) is the
standard preprocessing step. The reference repo has no embedding
surface — this extends the engine's E4 family alongside
operators/similarity.py and operators/cluster.py.

Spark-first shape, the estimator discipline (estimators/core.py)
applied to vectors: the ONLY distributed work is one scan producing
per-batch partial moments (count, Σx, Σxxᵀ — a d×d numpy outer-product
accumulation per Arrow batch inside ``mapInPandas``), and the ONLY
driver state is the #partition-bounded partial rows plus the d×d
covariance it reduces to — the same bounded-collect class as the
engine's d×d gram probes (every other .collect() in this repo). The
eigendecomposition is a driver-side O(d³) on a 64×64 matrix; the
projection back over the corpus is map-side (one batch×d @ d×k matmul
per Arrow batch — the operators/cluster.py kernel discipline).

Determinism: ``numpy.linalg.eigh`` on the same covariance gives the
same eigenvectors up to SIGN; signs are canonicalized (the
largest-|coordinate| entry of every component is made positive, ties
to the lower index) so two runs — and the tests' local twin — agree
exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fit_pca(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
    center: bool = True,
) -> dict:
    """Fit a PCA basis on ``df[vec_col]`` (array<numeric>, fixed dim).

    Returns ``{"mean": [d], "components": [k][d], "explained_var":
    [k], "n": int}`` — components are unit-norm eigenvectors of the
    (centered when ``center``) covariance, ordered by DESCENDING
    eigenvalue, signs canonicalized. NULL vectors are excluded (no
    position in the space — the cluster.py convention).

    One corpus scan: each partition accumulates its Arrow batches into
    a single (1 + d + d·d)-wide partial moment row; the collect is
    bounded by the partition count, never the data (the engine's
    d×d-probe collect class).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    feats = df.filter(F.col(vec_col).isNotNull()).select(
        F.col(vec_col).cast("array<double>").alias("v")
    )
    # fail fast on k > d with a 1-row probe — validating after the
    # moment scan would pay a full corpus pass before raising
    probe = feats.select(F.size("v").alias("d")).first()
    if probe is None:
        raise ValueError("fit_pca needs at least one non-NULL vector")
    if k > probe["d"]:
        raise ValueError(
            f"k={k} exceeds the vector dimension {probe['d']}"
        )
    dim = int(probe["d"])

    def partials(it):
        # accumulate across ALL of the partition's Arrow batches and
        # emit ONE row per partition — yielding per batch would send
        # n/batch_size rows of d² doubles to the driver (3+ GB at 1B
        # vectors), unbounded by anything but the data
        n, s, g = 0, None, None
        for pdf in it:
            if len(pdf) == 0:
                continue
            # a ragged corpus (mixed dims) passes the 1-row driver
            # probe; without this check np.stack dies mid-task with an
            # opaque shape error on an executor — name the contract
            lens = pdf["v"].map(len)
            if (lens != dim).any():
                bad = sorted(set(lens[lens != dim].tolist()))[:5]
                raise ValueError(
                    f"fit_pca requires fixed-dimension vectors: probed "
                    f"d={dim} but the corpus also has dims {bad}"
                )
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
            n += len(X)
            bs, bg = X.sum(0), X.T @ X
            s = bs if s is None else s + bs
            g = bg if g is None else g + bg
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    rows = feats.mapInPandas(
        partials, "n long, s array<double>, g array<double>"
    ).collect()  # bounded: one row per non-empty PARTITION
    if not rows:
        raise ValueError("fit_pca needs at least one non-NULL vector")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    g = np.sum([np.asarray(r["g"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = g / n - (np.outer(mean, mean) if center else 0.0)
    # eigh returns ASCENDING eigenvalues of the symmetric matrix
    w, v = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T  # (k, d)
    # sign canon: the largest-|coordinate| entry positive, ties low
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": (mean if center else np.zeros(d)).tolist(),
        "components": comps.tolist(),
        "explained_var": w[order].tolist(),
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Map-side projection onto a fitted basis: ``out = (x − mean) Wᵀ``
    (÷ √eigenvalue per component when ``whiten`` — unit-variance
    coordinates, the SemDeDup-style preprocessing). One batch×d @ d×k
    matmul per Arrow batch; the basis rides the closure (k·d floats,
    config-bounded). NULL vectors project to NULL (NULL-in/NULL-out,
    the multimodal convention)."""
    mean = np.asarray(model["mean"], dtype=np.float64)
    W = np.asarray(model["components"], dtype=np.float64)  # (k, d)
    if whiten:
        scale = 1.0 / np.sqrt(np.maximum(model["explained_var"], eps))
        W = W * scale[:, None]

    @F.pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        mask = v.notna().to_numpy()
        vals = np.empty(len(v), dtype=object)
        vals[:] = None
        if mask.any():
            X = np.stack(v[mask].to_numpy()).astype(np.float64, copy=False)
            Y = (X - mean) @ W.T
            # assign row-lists through an object buffer: direct fancy/
            # mask assignment of a list-of-lists makes pandas/numpy try
            # to broadcast it as a 2-D array
            buf = np.empty(len(Y), dtype=object)
            buf[:] = [r.tolist() for r in Y]
            vals[np.flatnonzero(mask)] = buf
        return pd.Series(vals)

    return df.withColumn(
        out_col, proj(F.col(vec_col).cast("array<double>"))
    )
