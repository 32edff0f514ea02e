"""Distributed logistic regression via IRLS on sufficient statistics
(SURVEY.md §2.5 M7, M11).

Parity target: R's ``glm(..., family=binomial())`` — same starting
values (mu0 = (y + 1/2)/2), same update (Fisher scoring on the working
response), same convergence criterion (relative deviance change <
1e-8), same warning conditions (fitted probabilities within machine-eps
of 0/1, or non-convergence in 25 iterations). The warning flag feeds
the reference's adaptive model-complexity fallback
(methods/etwcls.R:112-130).

Physical plan: each iteration is ONE distributed aggregation computing
XᵀWX (upper triangle), XᵀWz, the deviance, and the extreme fitted
probabilities — d(d+3)/2 + 3 fused product-sums over one scan. The d×d
solve is driver-side numpy. d ≤ ~16 here (spline tilt models), so an
iteration at 100 TB costs exactly one scan + tiny exchange; typical
fits converge in 4-7 iterations.

Spark ML's GeneralizedLinearRegression implements the same IRLS but
does not expose R's convergence/warning semantics, which the reference
's estimator ladder depends on — hence this ~100-line reimplementation
on DataFrame aggregations.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# R: eps <- 10 * .Machine$double.eps in binomial()$validmu-adjacent
# warning check ("fitted probabilities numerically 0 or 1 occurred").
_MU_EPS = 10 * np.finfo(float).eps


@dataclass
class GlmFit:
    beta: np.ndarray
    converged: bool
    warning: bool
    deviance: float
    n_iter: int

    @property
    def aic(self) -> float:
        """Binomial AIC = deviance + 2·d (R's glm AIC for 0/1 y)."""
        return self.deviance + 2.0 * len(self.beta)


def logistic_irls(
    df: DataFrame,
    x_cols: list[Column],
    y_col: Column,
    max_iter: int = 25,
    tol: float = 1e-8,
) -> GlmFit:
    """Fit P(y=1|x) = logistic(xᵀβ) by Fisher scoring, R-glm-compatible."""
    d = len(x_cols)
    y = y_col.cast("double")

    beta: np.ndarray | None = None  # None → R's mu-start first iteration
    dev_old = np.inf
    converged = False
    boundary_warning = False
    n_iter = 0

    for it in range(1, max_iter + 1):
        n_iter = it
        if beta is None:
            mu = (y + 0.5) / 2.0
            eta = F.log(mu / (1.0 - mu))
        else:
            eta = F.lit(float(beta[0])) * x_cols[0]
            for k in range(1, d):
                eta = eta + F.lit(float(beta[k])) * x_cols[k]
            mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (1.0 - mu)
        z = eta + (y - mu) / w

        aggs: list[Column] = []
        for i in range(d):
            for j in range(i, d):
                aggs.append(F.sum(w * x_cols[i] * x_cols[j]).alias(f"g_{i}_{j}"))
        for i in range(d):
            aggs.append(F.sum(w * x_cols[i] * z).alias(f"xz_{i}"))
        # Binomial deviance of CURRENT mu (pre-update, R reports post-
        # update; we recompute below) and boundary detection.
        aggs.append(
            F.sum(
                -2.0
                * (y * F.log(mu) + (1.0 - y) * F.log(1.0 - mu))
            ).alias("dev")
        )
        aggs.append(F.min(mu).alias("mu_min"))
        aggs.append(F.max(mu).alias("mu_max"))
        row = df.agg(*aggs).collect()[0]

        gram = np.empty((d, d))
        for i in range(d):
            for j in range(i, d):
                gram[i, j] = gram[j, i] = row[f"g_{i}_{j}"]
        xtz = np.array([row[f"xz_{i}"] for i in range(d)])
        try:
            beta = np.linalg.solve(gram, xtz)
        except np.linalg.LinAlgError:
            beta = np.linalg.lstsq(gram, xtz, rcond=None)[0]

        if beta is not None and it > 1:
            dev = float(row["dev"])
            if row["mu_min"] is not None and (
                row["mu_min"] < _MU_EPS or row["mu_max"] > 1 - _MU_EPS
            ):
                boundary_warning = True
            if abs(dev - dev_old) / (abs(dev) + 0.1) < tol:
                converged = True
                break
            dev_old = dev
        else:
            dev_old = float(row["dev"])

    # Final deviance & boundary check at the converged beta.
    eta = F.lit(float(beta[0])) * x_cols[0]
    for k in range(1, d):
        eta = eta + F.lit(float(beta[k])) * x_cols[k]
    mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    row = df.agg(
        F.sum(-2.0 * (y * F.log(mu) + (1.0 - y) * F.log(1.0 - mu))).alias("dev"),
        F.min(mu).alias("mu_min"),
        F.max(mu).alias("mu_max"),
    ).collect()[0]
    if row["mu_min"] < _MU_EPS or row["mu_max"] > 1 - _MU_EPS:
        boundary_warning = True

    return GlmFit(
        beta=beta,
        converged=converged,
        warning=boundary_warning or not converged,
        deviance=float(row["dev"]),
        n_iter=n_iter,
    )


def select_by_aic(
    df: DataFrame,
    candidates: dict[str, list[Column]],
    y_col: Column,
) -> tuple[str, GlmFit]:
    """Model selection by AIC over candidate logistic designs
    (SURVEY.md §2.5 M12; extras/et-model-selection.R:1-62): fit each
    candidate, return the argmin-AIC (name, fit)."""
    best_name, best_fit = None, None
    for name, design in candidates.items():
        fit = logistic_irls(df, design, y_col)
        if best_fit is None or fit.aic < best_fit.aic:
            best_name, best_fit = name, fit
    assert best_name is not None and best_fit is not None
    return best_name, best_fit


def predict_logistic(beta: np.ndarray, x_cols: list[Column]) -> Column:
    """Fitted-probability column from literal coefficients (M13)."""
    eta = F.lit(float(beta[0])) * x_cols[0]
    for k in range(1, len(x_cols)):
        eta = eta + F.lit(float(beta[k])) * x_cols[k]
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
