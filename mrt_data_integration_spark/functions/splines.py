"""B-spline basis expansion as pure column expressions (SURVEY.md §2.5
M10) — semantics-compatible with R's ``splines::bs(x, df, degree,
intercept=FALSE)``:

- interior knots at evenly-spaced type-7 quantiles of the data,
  boundary knots at the range;
- Cox-de-Boor recursion over the augmented knot vector
  ``[b_lo]*(degree+1) + interior + [b_hi]*(degree+1)``;
- first basis function dropped (intercept=FALSE).

Because knots are literals at plan-build time, the whole basis unrolls
into nested when()/arithmetic expressions inside whole-stage codegen —
no UDF, no extra pass. A numpy twin (``bs_design_numpy``) serves the
task-local simulation path and differential tests.

Knot estimation is exact type-7 (interpolated order statistics) via
orderBy+limit jobs — right for parity testing; at extreme scale pass
``approx=True`` to use approxQuantile's ε-exact variant instead.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class BSplineSpec:
    degree: int
    interior: tuple[float, ...]
    boundary: tuple[float, float]

    @property
    def n_basis(self) -> int:
        return len(self.interior) + self.degree

    @property
    def full_knots(self) -> list[float]:
        lo, hi = self.boundary
        ord_ = self.degree + 1
        return [lo] * ord_ + list(self.interior) + [hi] * ord_


def quantile_type7(
    df: DataFrame, col: str, probs: list[float], approx: bool = False
) -> list[float]:
    """R type-7 quantiles in ONE aggregation pass: Spark's exact
    ``percentile`` interpolates at h = (n−1)p — the same definition
    (verified bit-equal to numpy's default). ``approx=True`` swaps in
    approxQuantile (ε-bounded Greenwald-Khanna) for extreme scale."""
    if approx:
        return df.approxQuantile(col, probs, 0.001)
    plist = ", ".join(repr(float(p)) for p in probs)
    row = df.agg(F.expr(f"percentile({col}, array({plist}))").alias("q")).collect()[0]
    return [float(v) for v in row["q"]]


def bs_spec(
    df: DataFrame, col: str, df_: int, degree: int, approx: bool = False
) -> BSplineSpec:
    """Knot placement matching ``bs(x, df=df_, degree=degree)``:
    nIknots = df_ − degree interior knots at evenly spaced quantiles.
    One aggregation collects boundary and interior knots together."""
    n_iknots = df_ - degree
    if n_iknots < 0:
        raise ValueError("df must be >= degree")
    if n_iknots == 0:
        bounds = df.agg(F.min(col), F.max(col)).collect()[0]
        return BSplineSpec(
            degree=degree, interior=(), boundary=(float(bounds[0]), float(bounds[1]))
        )
    probs = [i / (n_iknots + 1) for i in range(1, n_iknots + 1)]
    if approx:
        interior = tuple(df.approxQuantile(col, probs, 0.001))
        bounds = df.agg(F.min(col), F.max(col)).collect()[0]
        return BSplineSpec(
            degree=degree,
            interior=interior,
            boundary=(float(bounds[0]), float(bounds[1])),
        )
    plist = ", ".join(repr(float(p)) for p in probs)
    row = df.agg(
        F.min(col).alias("lo"),
        F.max(col).alias("hi"),
        F.expr(f"percentile({col}, array({plist}))").alias("q"),
    ).collect()[0]
    return BSplineSpec(
        degree=degree,
        interior=tuple(float(v) for v in row["q"]),
        boundary=(float(row["lo"]), float(row["hi"])),
    )


def _cox_de_boor_exprs(x: Column, spec: BSplineSpec) -> list[Column]:
    """All nIknots+degree+1 basis functions of the full basis."""
    t = spec.full_knots
    k_max = spec.degree
    hi = spec.boundary[1]
    n_b0 = len(t) - 1

    # Degree-0: right-half-open indicator; the last nonempty interval is
    # right-closed so x == boundary_hi lands in a basis function.
    last_nonempty = max(i for i in range(n_b0) if t[i] < t[i + 1])
    level: list[Column] = []
    for i in range(n_b0):
        if t[i] == t[i + 1]:
            level.append(F.lit(0.0))
        elif i == last_nonempty:
            cond = (x >= F.lit(t[i])) & (x <= F.lit(hi))
            level.append(F.when(cond, 1.0).otherwise(0.0))
        else:
            cond = (x >= F.lit(t[i])) & (x < F.lit(t[i + 1]))
            level.append(F.when(cond, 1.0).otherwise(0.0))

    for k in range(1, k_max + 1):
        nxt: list[Column] = []
        for i in range(len(level) - 1):
            term = F.lit(0.0)
            if t[i + k] != t[i]:
                term = term + (x - F.lit(t[i])) / F.lit(t[i + k] - t[i]) * level[i]
            if t[i + k + 1] != t[i + 1]:
                term = term + (F.lit(t[i + k + 1]) - x) / F.lit(
                    t[i + k + 1] - t[i + 1]
                ) * level[i + 1]
            nxt.append(term)
        level = nxt
    return level


def bs_columns(x: Column, spec: BSplineSpec) -> list[Column]:
    """The bs() design columns (full basis minus the first function)."""
    return _cox_de_boor_exprs(x, spec)[1:]


def bs_design_numpy(x: np.ndarray, spec: BSplineSpec) -> np.ndarray:
    """numpy twin of ``bs_columns`` for task-local fits and tests."""
    t = np.asarray(spec.full_knots)
    k_max = spec.degree
    hi = spec.boundary[1]
    n_b0 = len(t) - 1
    x = np.asarray(x, dtype=float)

    last_nonempty = max(i for i in range(n_b0) if t[i] < t[i + 1])
    level = []
    for i in range(n_b0):
        if t[i] == t[i + 1]:
            level.append(np.zeros_like(x))
        elif i == last_nonempty:
            level.append(((x >= t[i]) & (x <= hi)).astype(float))
        else:
            level.append(((x >= t[i]) & (x < t[i + 1])).astype(float))

    for k in range(1, k_max + 1):
        nxt = []
        for i in range(len(level) - 1):
            term = np.zeros_like(x)
            if t[i + k] != t[i]:
                term = term + (x - t[i]) / (t[i + k] - t[i]) * level[i]
            if t[i + k + 1] != t[i + 1]:
                term = term + (t[i + k + 1] - x) / (t[i + k + 1] - t[i + 1]) * level[i + 1]
            nxt.append(term)
        level = nxt
    return np.column_stack(level[1:])
