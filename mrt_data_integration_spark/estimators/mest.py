"""Shared M-estimation sandwich assembly (SURVEY.md §2.4 A1-A5, §2.6 L1).

Every estimator in the family (wcls/pwcls/etwcls/drwcls/petwcls) ends
the same way: a stacked score vector per row, a block Hessian of
row-product sums, per-cluster score aggregation, meat = crossprod of
cluster sums, sandwich = H⁻¹ B H⁻ᵀ · n/(n−d).

``SandwichBuilder`` collects score expressions and Hessian-entry
expressions and evaluates everything with ONE wide projection plus ONE
cluster-partitioned Arrow pass:

  1. project: every score / Hessian term becomes a flat column
     (expressions evaluate once, fused in a single codegen stage);
  2. repartition by the cluster key (the only shuffle — same movement
     a groupBy would pay) so each task holds whole clusters;
  3. mapInPandas: per task, pandas-groupby cluster → cluster score
     sums; accumulate meat partial SᵀS, Hessian-term sums, and the
     cluster count in numpy/BLAS; emit one flattened row per task;
  4. driver: sum the ≤(#partitions) partial rows.

Equivalent numbers to a d(d+1)/2-column SQL aggregation, but the plan
is fixed-size: at d≈34 the declarative form pays tens of seconds of
Catalyst/Janino work for ~900 aggregate expressions; the Arrow pass
pays none and does the quadratic arithmetic in BLAS. At 100 TB the
shuffle is identical and partials keep the reduce tiny.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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
        """Run the cluster-partitioned reduction; return
        (hessian, meat, n_users)."""
        d = self.d
        missing = [i for i, s in enumerate(self._scores) if s is None]
        if missing:
            raise ValueError(f"scores not set for positions {missing}")
        hess_keys = list(self._hess_exprs.keys())
        n_h = len(hess_keys)
        score_names = [f"s_{i}" for i in range(d)]
        hess_names = [f"h_{k}" for k in range(n_h)]

        row_level = df.select(
            F.col(self.cluster_col).alias("__cluster__"),
            *[s.alias(nm) for s, nm in zip(self._scores, score_names)],
            *[self._hess_exprs[key].alias(nm) for key, nm in zip(hess_keys, hess_names)],
        )

        if d * (d + 1) // 2 + n_h <= 24:
            # Small systems: declarative two-level aggregation —
            # groupBy(cluster) partial+final hash agg, then one global
            # agg of the pairwise products. Fully JVM-side; no Python
            # workers, no explicit repartition (the groupBy exchange
            # hash-partitions by cluster on its own).
            lvl1 = row_level.groupBy("__cluster__").agg(
                *[F.sum(nm).alias(f"u_{i}") for i, nm in enumerate(score_names)],
                *[F.sum(nm).alias(f"hu_{k}") for k, nm in enumerate(hess_names)],
            )
            us = [F.col(f"u_{i}") for i in range(d)]
            exprs = [F.sum(us[i] * us[j]) for i in range(d) for j in range(i, d)]
            exprs += [F.sum(F.col(f"hu_{k}")) for k in range(n_h)]
            exprs.append(F.count(F.lit(1)))
            vals = [
                float(v if v is not None else 0.0)
                for v in lvl1.agg(*exprs).collect()[0]
            ]
            meat = np.zeros((d, d))
            k = 0
            for i in range(d):
                for j in range(i, d):
                    meat[i, j] = meat[j, i] = vals[k]
                    k += 1
            hessian = self._hess_const.copy()
            for key in hess_keys:
                hessian[key] += vals[k]
                k += 1
            n_users = int(round(vals[k]))
            return hessian, meat, n_users

        row_level = row_level.repartition("__cluster__")

        n_tri = d * (d + 1) // 2
        part_schema = (
            ", ".join(f"m_{k} double" for k in range(n_tri))
            + (", " if n_h else "")
            + ", ".join(f"hh_{k} double" for k in range(n_h))
            + ", n_users double"
        )

        def reduce_task(batches):
            frames = [pdf for pdf in batches if len(pdf)]
            if not frames:
                return
            pdf = pd.concat(frames, ignore_index=True)
            # whole clusters live in this task (hash-partitioned).
            cl = pdf.groupby("__cluster__", sort=False)[score_names].sum().to_numpy()
            meat = cl.T @ cl
            iu = np.triu_indices(d)
            row = list(meat[iu])
            if n_h:
                row += list(pdf[hess_names].sum().to_numpy())
            row.append(float(cl.shape[0]))
            yield pd.DataFrame([row])

        parts = row_level.mapInPandas(reduce_task, part_schema).toPandas()
        iu = np.triu_indices(d)
        meat = np.zeros((d, d))
        meat[iu] = parts[[f"m_{k}" for k in range(n_tri)]].to_numpy().sum(axis=0)
        meat = meat + meat.T - np.diag(np.diag(meat))
        hessian = self._hess_const.copy()
        if n_h:
            hsums = parts[[f"hh_{k}" for k in range(n_h)]].to_numpy().sum(axis=0)
            for key, v in zip(hess_keys, hsums):
                hessian[key] += v
        n_users = int(parts["n_users"].sum())
        return hessian, meat, n_users
