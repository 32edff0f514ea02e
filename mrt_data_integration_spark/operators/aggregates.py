"""Moment / gram / cluster-robust "meat" aggregations (SURVEY.md §2.4).

These are the engine's replacement for the reference's hot spot — the
per-user score crossproduct loop (extras/fast-meat.cpp:7-42 and
extras/helpers.R:7-22 in eastonhuch/mrt-data-integration). In Spark the
whole thing is ONE two-level hash aggregation:

    level 1:  groupBy(cluster_key).agg(sum(score_j) ...)      [A1]
    level 2:  agg(sum(s_i * s_j) for i<=j)                    [A2]

Both levels get map-side partial aggregation and whole-stage codegen for
free; no native kernel, no UDF, no row-order assumption. d(d+1)/2 output
columns stay tiny (d <= ~34 → <= 595 sums), so the shuffle carries one
row of width d per cluster at level 1 and a single row at level 2.

At 100 TB the level-1 shuffle is the only data movement and is keyed by
the cluster column (user_id), which is high-cardinality and uniform —
no skew; partial aggregation reduces each map task's output to
(#distinct users in task) rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _cols(cols: list[Column | str]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cols]


def cross_moments(
    df: DataFrame,
    left: list[Column | str],
    right: list[Column | str] | None = None,
    weight: Column | str | None = None,
    prefix: str = "m",
) -> DataFrame:
    """Single-row DataFrame of weighted cross moments sum(w * l_i * r_j).

    With ``right=None`` computes the symmetric gram (upper triangle only).
    Column naming: ``{prefix}_{i}_{j}`` (0-based).
    """
    lc = _cols(left)
    rc = _cols(right) if right is not None else lc
    w = None if weight is None else (F.col(weight) if isinstance(weight, str) else weight)
    aggs = []
    for i, li in enumerate(lc):
        j_start = i if right is None else 0
        for j in range(j_start, len(rc)):
            term = li * rc[j]
            if w is not None:
                term = w * term
            aggs.append(F.sum(term).alias(f"{prefix}_{i}_{j}"))
    return df.agg(*aggs)


def weighted_gram(
    df: DataFrame,
    x_cols: list[Column | str],
    weight: Column | str | None = None,
    y_col: Column | str | None = None,
) -> tuple[np.ndarray, np.ndarray | None, float]:
    """Collect XᵀWX (and optionally XᵀWy, sum w) in ONE aggregation pass.

    The reference computes ``crossprod(sqrt(w) * X)`` (methods/wcls.R:83-85);
    here the weight folds directly into each product expression so no
    intermediate column materializes. Returns (gram d×d, xty or None, n_w).
    """
    xc = _cols(x_cols)
    d = len(xc)
    w = None if weight is None else (F.col(weight) if isinstance(weight, str) else weight)
    y = None if y_col is None else (F.col(y_col) if isinstance(y_col, str) else y_col)

    aggs: list[Column] = []
    for i in range(d):
        for j in range(i, d):
            term = xc[i] * xc[j]
            if w is not None:
                term = w * term
            aggs.append(F.sum(term).alias(f"g_{i}_{j}"))
    if y is not None:
        for i in range(d):
            term = xc[i] * y
            if w is not None:
                term = w * term
            aggs.append(F.sum(term).alias(f"xy_{i}"))
    aggs.append(F.sum(F.lit(1.0) if w is None else w).alias("n_w"))

    row = df.agg(*aggs).collect()[0]
    gram = np.empty((d, d))
    for i in range(d):
        for j in range(i, d):
            gram[i, j] = gram[j, i] = row[f"g_{i}_{j}"]
    xty = None
    if y is not None:
        xty = np.array([row[f"xy_{i}"] for i in range(d)])
    return gram, xty, float(row["n_w"])


def cluster_meat(
    df: DataFrame,
    score_cols: list[Column | str],
    cluster_col: Column | str = "user_id",
) -> np.ndarray:
    """Cluster-robust meat matrix B = Σ_clusters s_c s_cᵀ.

    Two-level aggregation replacing extras/helpers.R:17-22 (the explicit
    ``aggregate(scores ~ user_ids, sum)`` path — the layout-independent
    semantics; see SURVEY.md §1.3 for why the balanced reshape fast path
    is NOT replicated).
    """
    sc = _cols(score_cols)
    d = len(sc)
    key = F.col(cluster_col) if isinstance(cluster_col, str) else cluster_col
    per_cluster = df.groupBy(key.alias("__cluster__")).agg(
        *[F.sum(c).alias(f"s_{i}") for i, c in enumerate(sc)]
    )
    aggs = [
        F.sum(F.col(f"s_{i}") * F.col(f"s_{j}")).alias(f"m_{i}_{j}")
        for i in range(d)
        for j in range(i, d)
    ]
    row = per_cluster.agg(*aggs).collect()[0]
    meat = np.empty((d, d))
    for i in range(d):
        for j in range(i, d):
            meat[i, j] = meat[j, i] = row[f"m_{i}_{j}"]
    return meat
