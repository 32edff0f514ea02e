"""Shared M-estimation sandwich assembly (SURVEY.md §2.4 A1-A5, §2.6 L1).

Every estimator in the family (wcls/pwcls/etwcls/drwcls/petwcls) ends
the same way: a stacked score vector per row, a block Hessian of
row-product sums, per-cluster score aggregation, meat = crossprod of
cluster sums, sandwich = H⁻¹ B H⁻ᵀ · n/(n−d).

``SandwichBuilder`` collects score expressions and Hessian-entry
expressions, then evaluates EVERYTHING in one two-level aggregation:

  level 1: groupBy(cluster) → sums of scores + partial sums of each
           pending Hessian entry;
  level 2: sums of score-products (meat, upper triangle) + Hessian
           totals.

One shuffle keyed by the cluster column, regardless of how many blocks
an estimator stacks. Hessian blocks already known as numbers (e.g. the
WLS gram collected when solving) are passed as constants and skip the
data entirely.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class SandwichBuilder:
    def __init__(self, d: int, cluster_col: str = "user_id"):
        self.d = d
        self.cluster_col = cluster_col
        self._scores: list[Column | None] = [None] * d
        self._hess_exprs: dict[tuple[int, int], Column] = {}
        self._hess_const = np.zeros((d, d))

    def set_score(self, pos: int, expr: Column) -> None:
        """Row-level score expression for parameter ``pos`` (rows where
        the score is structurally zero should contribute 0.0 — use
        ``F.when(mask, expr).otherwise(0.0)``)."""
        self._scores[pos] = expr

    def add_hessian_expr(self, i: int, j: int, expr: Column) -> None:
        """Hessian entry (i, j) as a row-level expression to be summed."""
        key = (i, j)
        if key in self._hess_exprs:
            self._hess_exprs[key] = self._hess_exprs[key] + expr
        else:
            self._hess_exprs[key] = expr

    def add_hessian_const(self, i: int, j: int, value: float) -> None:
        self._hess_const[i, j] += value

    def add_hessian_block_const(self, rows: range, cols: range, block: np.ndarray) -> None:
        for bi, i in enumerate(rows):
            for bj, j in enumerate(cols):
                self._hess_const[i, j] += block[bi, bj]

    def assemble(self, df: DataFrame) -> tuple[np.ndarray, np.ndarray, int]:
        """Run the two-level aggregation; return (hessian, meat, n_users)."""
        d = self.d
        missing = [i for i, s in enumerate(self._scores) if s is None]
        if missing:
            raise ValueError(f"scores not set for positions {missing}")
        score_names = [f"s_{i}" for i in range(d)]
        hess_names = {k: f"h_{k[0]}_{k[1]}" for k in self._hess_exprs}

        level1 = df.groupBy(F.col(self.cluster_col).alias("__cluster__")).agg(
            *[F.sum(s).alias(nm) for s, nm in zip(self._scores, score_names)],
            *[F.sum(e).alias(nm) for (_, e), nm in zip(self._hess_exprs.items(), hess_names.values())],
        )
        final = level1.agg(
            *[
                F.sum(F.col(score_names[i]) * F.col(score_names[j])).alias(f"m_{i}_{j}")
                for i in range(d)
                for j in range(i, d)
            ],
            *[F.sum(F.col(nm)).alias(nm) for nm in hess_names.values()],
            F.count(F.lit(1)).alias("n_users"),
        ).collect()[0]

        meat = np.empty((d, d))
        for i in range(d):
            for j in range(i, d):
                meat[i, j] = meat[j, i] = final[f"m_{i}_{j}"]
        hessian = self._hess_const.copy()
        for (i, j), nm in hess_names.items():
            hessian[i, j] += final[nm]
        return hessian, meat, int(final["n_users"])
