"""Distributed logistic regression via IRLS on sufficient statistics
(SURVEY.md §2.5 M7, M11).

Parity target: R's ``glm(..., family=binomial())`` — same starting
values (mu0 = (y + 1/2)/2), same update (Fisher scoring on the working
response), same convergence criterion (relative deviance change <
1e-8), same warning conditions (FINAL fitted probabilities within
machine-eps of 0/1 — R checks mu only after the IRLS loop exits — or
non-convergence in 25 iterations). The warning flag feeds
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

    final_gram: np.ndarray | None = None

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
    driver_collect: bool | None = None,
) -> GlmFit:
    """Fit P(y=1|x) = logistic(xᵀβ) by Fisher scoring, R-glm-compatible.

    Physical plan: driver-sized design matrices (≲8M cells — the probe
    is ``limit(cap+1)``, exact like ``core.collect_cluster_stats``)
    collect ONCE via Arrow and every Fisher-scoring iteration is pure
    BLAS on the driver — IRLS latency stops being #iterations Spark
    jobs. Beyond the cap, per iteration: ONE Arrow-batched
    ``mapInPandas`` pass emitting a per-partition partial of (XᵀWX
    upper triangle, XᵀWz, deviance, mu extrema), summed on the driver —
    the treeAggregate pattern Spark ML uses internally. Identical math
    either way (a differential test pins it); ``driver_collect=False``
    forces the distributed path.
    """
    import pandas as pd

    d = len(x_cols)
    y = y_col.cast("double")

    # Materialize (x, y) once; every iteration re-reads these columns.
    proj = df.select(
        *[x.cast("double").alias(f"x_{i}") for i, x in enumerate(x_cols)],
        y.alias("__y__"),
    )

    X_local: np.ndarray | None = None
    y_local: np.ndarray | None = None
    if driver_collect is not False:
        max_rows = 8_388_608 // max(1, d + 1)
        conf = df.sparkSession.conf
        _key = "spark.sql.limit.initialNumPartitions"
        _prev = conf.get(_key, None)
        conf.set(_key, "10000000")
        try:
            probe = proj.limit(max_rows + 1).toPandas()
        finally:
            if _prev is None:
                conf.unset(_key)
            else:
                conf.set(_key, _prev)
        if len(probe) <= max_rows:
            X_local = probe[[f"x_{i}" for i in range(d)]].to_numpy(dtype=float)
            y_local = probe["__y__"].to_numpy(dtype=float)
    n_tri = d * (d + 1) // 2
    part_schema = (
        ", ".join(f"g_{k} double" for k in range(n_tri))
        + ", "
        + ", ".join(f"xz_{i} double" for i in range(d))
        + ", dev double, mu_min double, mu_max double"
    )

    def make_pass(beta_now: np.ndarray | None):
        def run(batches):
            G = np.zeros((d, d))
            xz = np.zeros(d)
            dev = 0.0
            mu_min, mu_max = 1.0, 0.0
            seen = False
            for pdf in batches:
                if not len(pdf):
                    continue
                seen = True
                X = pdf[[f"x_{i}" for i in range(d)]].to_numpy()
                yv = pdf["__y__"].to_numpy()
                if beta_now is None:
                    mu = (yv + 0.5) / 2.0
                    eta = np.log(mu / (1.0 - mu))
                else:
                    eta = X @ beta_now
                    mu = 1.0 / (1.0 + np.exp(-eta))
                # Separated data drives mu to exactly 0/1 → w = 0 →
                # z = NaN and the fit collapses. Clamp like R's glm
                # (which caps eta so mu stays inside (eps, 1-eps) and
                # reports "fitted probabilities numerically 0 or 1" —
                # our boundary_warning flags the same condition).
                mu = np.clip(mu, _MU_EPS, 1.0 - _MU_EPS)
                w = mu * (1.0 - mu)
                z = eta + (yv - mu) / w
                Xw = X * w[:, None]
                G += Xw.T @ X
                xz += Xw.T @ z
                dev += float(-2.0 * np.sum(yv * np.log(mu) + (1 - yv) * np.log1p(-mu)))
                mu_min = min(mu_min, float(mu.min()))
                mu_max = max(mu_max, float(mu.max()))
            if seen:
                iu = np.triu_indices(d)
                row = list(G[iu]) + list(xz) + [dev, mu_min, mu_max]
                yield pd.DataFrame([row])

        return run

    def one_pass_local(beta_now):
        """Driver twin of one_pass — same math on the collected design."""
        X, yv = X_local, y_local
        if len(yv) == 0:  # matches the distributed path's empty init
            return np.zeros((d, d)), np.zeros(d), 0.0, 1.0, 0.0
        if beta_now is None:
            mu = (yv + 0.5) / 2.0
            eta = np.log(mu / (1.0 - mu))
        else:
            eta = X @ beta_now
            mu = 1.0 / (1.0 + np.exp(-eta))
        mu = np.clip(mu, _MU_EPS, 1.0 - _MU_EPS)  # separation guard, as above
        w = mu * (1.0 - mu)
        z = eta + (yv - mu) / w
        Xw = X * w[:, None]
        dev = float(-2.0 * np.sum(yv * np.log(mu) + (1 - yv) * np.log1p(-mu)))
        return Xw.T @ X, Xw.T @ z, dev, float(mu.min()), float(mu.max())

    def one_pass(beta_now):
        if X_local is not None:
            return one_pass_local(beta_now)
        parts = proj.mapInPandas(make_pass(beta_now), part_schema).toPandas()
        G = np.zeros((d, d))
        iu = np.triu_indices(d)
        gsum = parts[[f"g_{k}" for k in range(n_tri)]].to_numpy().sum(axis=0)
        G[iu] = gsum
        G = G + G.T - np.diag(np.diag(G))
        xz = parts[[f"xz_{i}" for i in range(d)]].to_numpy().sum(axis=0)
        return (
            G,
            xz,
            float(parts["dev"].sum()),
            float(parts["mu_min"].min()),
            float(parts["mu_max"].max()),
        )

    beta: np.ndarray | None = None  # None → R's mu-start first iteration
    dev_old = np.inf
    converged = False
    boundary_warning = False
    n_iter = 0

    for it in range(1, max_iter + 1):
        n_iter = it
        gram, xtz, dev, mu_min, mu_max = one_pass(beta)
        try:
            beta = np.linalg.solve(gram, xtz)
        except np.linalg.LinAlgError:
            beta = np.linalg.lstsq(gram, xtz, rcond=None)[0]

        if it > 1:
            if abs(dev - dev_old) / (abs(dev) + 0.1) < tol:
                converged = True
                break
            dev_old = dev
        else:
            dev_old = dev

    # Final deviance & boundary check at the converged beta. The gram
    # at convergence IS the logistic-equation Hessian block X'WX with
    # W = mu(1-mu) — estimators reuse it instead of re-summing.
    final_gram, _, dev, mu_min, mu_max = one_pass(beta)
    # <=/>= : the separation clamp pins boundary mu to exactly _MU_EPS
    if mu_min <= _MU_EPS or mu_max >= 1 - _MU_EPS:
        boundary_warning = True

    return GlmFit(
        beta=beta,
        converged=converged,
        warning=boundary_warning or not converged,
        deviance=dev,
        n_iter=n_iter,
        final_gram=final_gram,
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
