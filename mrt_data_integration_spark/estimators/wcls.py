"""WCLS — weighted-and-centered least squares with cluster-robust
(sandwich) inference, distributed (SURVEY.md §2.5 M1).

Semantics parity: methods/wcls.R:116-194 + extras/helpers.R of
eastonhuch/mrt-data-integration. Architecture is Spark-first, not a
translation: the estimator is THREE distributed aggregation passes over
an immutable DataFrame plus O(d³) numpy on the driver (d ≤ ~34):

  pass 1 (optional): intercept-only propensity  = one avg(a);
  pass 2: WLS sufficient statistics XᵀWX, XᵀWy  = one agg of
          d(d+1)/2 + d fused product-sums (weight folded in — the
          reference's sqrt(w)-scaling trick is unnecessary here);
  pass 3: per-cluster score sums → meat, plus the M-estimation
          cross-Hessian sums, all in ONE two-level aggregation.

Each pass is a scan → partial agg → tiny exchange; nothing row-level
ever reaches the driver, so the same code runs at 16k rows or 100 TB.

Clustering is by explicit key column (`cluster_col`), never row order —
see SURVEY.md §1.3 for the reference's balanced-path layout hazard (its
golden outputs cluster consecutive row blocks; tests reproduce that by
passing a block-derived cluster column, while real analyses use user_id).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.functions import derive
from mrt_data_integration_spark.linalg import (
    chi2_stat,
    final_sandwich_step,
    se_from_var,
)

ColumnLike = Column | str
DesignSpec = list[tuple[str, ColumnLike]]


def _c(col: ColumnLike) -> Column:
    return F.col(col) if isinstance(col, str) else col


# test hook: set to a small int to force collect_cluster_stats down the
# persisted-distributed fallback (never hit at test data scale otherwise)
_FORCE_MAX_CLUSTERS: int | None = None


def _one_scan_fit(
    df: DataFrame,
    design: list[Column],
    y: Column,
    w: Column,
    cluster_col: str,
    d_h: int,
    estimate_p: bool,
    a: Column | None = None,
    p_hat: float | None = None,
    p_tgt_a: Column | None = None,
    raw_cols: list[Column] | None = None,
) -> tuple[np.ndarray, np.ndarray, int, np.ndarray, np.ndarray, int]:
    """ONE-scan WCLS: every number the estimator needs — WLS solution,
    Hessian (incl. the propensity cross block), cluster meat — derives
    from per-cluster sufficient statistics, so the big table is read
    exactly once.

    Works because every row-level quantity is linear in the (unknown at
    scan time) coefficient vector β: the per-cluster score vector is
    s_u = c_u − G_u β with c_u = Σ_u w·x·y and G_u = Σ_u w·x·xᵀ, and the
    propensity cross-Hessian expands into β-free moment sums (S1, S2,
    S3, S4 below). Physical plan:

      1. groupBy(cluster).agg(~d²/2 fused product-sums)   ← the ONLY
         pass over the data (map-side partial + tiny keyed exchange);
      2. one global agg over the per-cluster frame → gram/xty → β,
         Hessian assembled on the driver;
      3. one more agg over the (persisted, n_clusters-row) frame with β
         as literals → meat = Σ_u s_u s_uᵀ.

    Versus the generic two-pass path (WLS scan + sandwich scan) this
    halves the scan cost — the dominant term at 100 TB — at the price
    of a wider aggregate, so it is gated to small designs (the generic
    path stays the plan for d ≳ 10, where agg width grows ~d² and
    Janino compile time would dominate at test scale).

    Returns (beta, gram, n, hessian, meat, n_users).
    """
    d_hr = len(design)
    d_alpha = 1 if estimate_p else 0
    d = d_alpha + d_hr
    d_r = d_hr - d_h

    xs = [x.cast("double").alias(f"__x_{i}__") for i, x in enumerate(design)]
    cols = [F.col(cluster_col).alias("__cluster__"), *xs,
            y.cast("double").alias("__y__"), w.cast("double").alias("__w__")]
    if estimate_p:
        assert a is not None and p_hat is not None and p_tgt_a is not None
        assert raw_cols is not None
        # log_pa_deriv: d/dα of log p_tgt_a at the intercept-only MLE.
        ldp = (-(2.0 * a.cast("double") - 1.0) * p_hat * (1.0 - p_hat)) / p_tgt_a
        cols.append(a.cast("double").alias("__a__"))
        cols.append(ldp.alias("__ldp__"))
        cols += [r.cast("double").alias(f"__raw_{j}__") for j, r in enumerate(raw_cols)]
    proj = df.select(*cols)

    # Aggs as SQL strings, ONE py4j round-trip each: building these as
    # nested Column ops costs ~6-8 gateway calls per aggregate, and the
    # O(d²) aggregate count made expression construction (driver-side
    # py4j latency, not Spark work) the dominant cold cost of a fit.
    # Only the fixed projection names (__x_i__, __w__, __y__, ...) are
    # referenced, so plain string interpolation is safe.
    def _x(i: int) -> str:
        return f"__x_{i}__"

    aggs: list[Column] = []
    aggs += [F.expr(f"sum(__w__*{_x(i)}*{_x(j)}) AS g_{i}_{j}")
             for i in range(d_hr) for j in range(i, d_hr)]
    aggs += [F.expr(f"sum(__w__*{_x(i)}*__y__) AS c_{i}") for i in range(d_hr)]
    aggs.append(F.expr("cast(count(1) AS double) AS n_u"))
    if estimate_p:
        aggs.append(F.expr("sum(__a__) AS sa"))
        aggs += [F.expr(f"sum({_x(k)}*__w__*__y__*__ldp__) AS s1_{k}")
                 for k in range(d_hr)]
        aggs += [F.expr(f"sum({_x(i)}*__w__*{_x(j)}*__ldp__) AS s2_{i}_{j}")
                 for i in range(d_hr) for j in range(i, d_hr)]
        aggs += [F.expr(f"sum(__w__*{_x(k)}*__raw_{j}__) AS s3_{k}_{j}")
                 for k in range(d_hr) for j in range(d_r)]
        aggs += [F.expr(f"sum(__raw_{j}__*__w__*__y__) AS s4_{j}")
                 for j in range(d_r)]

    lvl1 = proj.groupBy("__cluster__").agg(*aggs)
    stat_names = [c for c in lvl1.columns if c != "__cluster__"]

    # Probe/fallback shared with the two-stage estimators (pwcls):
    # driver-sized cluster frames collect once via Arrow; bigger frames
    # stay persisted-distributed and reduce by two more tiny aggs.
    from mrt_data_integration_spark.estimators.core import collect_cluster_stats

    stats, g, n_users, persisted = collect_cluster_stats(
        lvl1, stat_names, max_clusters=_FORCE_MAX_CLUSTERS
    )
    if persisted is not None:
        lvl1 = persisted
    n = int(round(g["n_u"]))

    gram = np.zeros((d_hr, d_hr))
    for i in range(d_hr):
        for j in range(i, d_hr):
            gram[i, j] = gram[j, i] = g[f"g_{i}_{j}"]
    xty = np.array([g[f"c_{i}"] for i in range(d_hr)])
    from mrt_data_integration_spark.linalg import solve_wls

    beta = solve_wls(gram, xty)

    hessian = np.zeros((d, d))
    hessian[d_alpha:, d_alpha:] = gram
    if estimate_p:
        hessian[0, 0] = p_hat * (1.0 - p_hat) * n
        pd_const = -(1.0 - p_hat)
        s2 = np.zeros((d_hr, d_hr))
        for i in range(d_hr):
            for j in range(i, d_hr):
                s2[i, j] = s2[j, i] = g[f"s2_{i}_{j}"]
        s3 = np.array([[g[f"s3_{k}_{j}"] for j in range(d_r)] for k in range(d_hr)])
        beta_r = beta[d_h:]
        for k in range(d_hr):
            t = g[f"s1_{k}"] - float(s2[k] @ beta)
            t += p_hat * pd_const * float(s3[k] @ beta_r)
            if k >= d_h:
                j = k - d_h
                t += -p_hat * pd_const * (g[f"s4_{j}"] - float(s3[:, j] @ beta))
            hessian[d_alpha + k, 0] = t

    # Meat: per-cluster scores are linear in the level-1 stats with β
    # known — s_u = c_u − G_u β (and Σ_u(a−p̂) for the propensity row).
    if stats is not None:
        col_ix = {nm: k for k, nm in enumerate(stat_names)}
        sc = np.empty((n_users, d))
        if estimate_p:
            sc[:, 0] = stats[:, col_ix["sa"]] - stats[:, col_ix["n_u"]] * p_hat
        for i in range(d_hr):
            v = stats[:, col_ix[f"c_{i}"]].copy()
            for m in range(d_hr):
                nm = f"g_{i}_{m}" if i <= m else f"g_{m}_{i}"
                v -= float(beta[m]) * stats[:, col_ix[nm]]
            sc[:, d_alpha + i] = v
        meat = sc.T @ sc
        return beta, gram, n, hessian, meat, n_users

    # Distributed fallback: one more tiny agg over the persisted frame.
    def score(i: int) -> Column:
        expr = F.col(f"c_{i}")
        for m in range(d_hr):
            nm = f"g_{i}_{m}" if i <= m else f"g_{m}_{i}"
            expr = expr - F.lit(float(beta[m])) * F.col(nm)
        return expr

    scores = ([F.col("sa") - F.col("n_u") * F.lit(p_hat)] if estimate_p else [])
    scores += [score(i) for i in range(d_hr)]
    meat_aggs = [F.sum(scores[i] * scores[j]).alias(f"m_{i}_{j}")
                 for i in range(d) for j in range(i, d)]
    mrow = lvl1.agg(*meat_aggs).collect()[0]
    meat = np.zeros((d, d))
    for idx, (i, j) in enumerate(
        [(i, j) for i in range(d) for j in range(i, d)]
    ):
        v = float(mrow[idx] if mrow[idx] is not None else 0.0)
        meat[i, j] = meat[j, i] = v
    lvl1.unpersist()
    from mrt_data_integration_spark.cache_registry import untrack

    untrack(lvl1)
    return beta, gram, n, hessian, meat, n_users


@dataclass
class WclsFit:
    """Result contract of methods/wcls.R:182-193."""

    beta_r: np.ndarray
    se_beta_r: np.ndarray
    var_beta_r: np.ndarray
    beta_h: np.ndarray
    beta_r_z_scores: np.ndarray
    beta_r_chi2: float
    sandwich: np.ndarray
    n: int
    n_users: int
    p: int
    r_names: list[str] = field(default_factory=list)
    h_names: list[str] = field(default_factory=list)
    tilt_warning: bool = False

    def to_df(self, spark: SparkSession) -> DataFrame:
        """(coef, estimate, se) result table."""
        rows = [
            (name, float(b), float(s))
            for name, b, s in zip(self.r_names, self.beta_r, self.se_beta_r)
        ]
        return spark.createDataFrame(rows, "coef string, estimate double, se double")


def wcls(
    df: DataFrame,
    x_h: DesignSpec,
    moderators: DesignSpec,
    y: ColumnLike = "y",
    a: ColumnLike = "a",
    p_behavior_a: ColumnLike = "p_h_a",
    p_target: ColumnLike | float | None = None,
    weight_override: ColumnLike | None = None,
    cluster_col: str = "user_id",
    beta_r_true: np.ndarray | None = None,
) -> WclsFit:
    """Fit WCLS of ``y ~ X_h + a_centered * moderators`` with weight
    ``p_target_a / p_behavior_a`` and cluster-robust SEs.

    - ``x_h``: nuisance design columns (include the intercept yourself:
      ``("intercept", F.lit(1.0))``).
    - ``moderators``: effect-moderator columns S; the causal design is
      ``a_centered * S`` (reference's beta_r_formula terms).
    - ``p_target=None`` → intercept-only propensity estimated from the
      data (= avg(a), the closed form of the binomial GLM the reference
      fits at wcls.R:123), and the propensity score equation joins the
      sandwich exactly as at wcls.R:53-58,87-98.
    - ``p_target=<float|Column>`` → known randomization probability; no
      propensity block.
    """
    y_c, a_c = _c(y), _c(a)
    estimate_p = p_target is None
    if estimate_p:
        # Pass 1: intercept-only binomial MLE is the sample mean.
        p_hat_val = float(df.agg(F.avg(a_c.cast("double"))).collect()[0][0])
        p_tgt = F.lit(p_hat_val)
    else:
        p_tgt = F.lit(float(p_target)) if isinstance(p_target, (int, float)) else _c(p_target)

    a_centered = derive.centered_treatment(a_c, p_tgt)
    p_tgt_a = derive.observed_arm_prob(a_c, p_tgt)
    w = derive.ipw_weight(p_tgt_a, _c(p_behavior_a), override=weight_override)
    # Tilting enters via weight_override / a pre-derived column in v1.
    w_and_tilt = w

    h_names = [n for n, _ in x_h]
    r_names = [n for n, _ in moderators]
    d_h, d_r = len(x_h), len(moderators)
    d_hr = d_h + d_r
    d_alpha = 1 if estimate_p else 0
    d = d_alpha + d_hr

    # Materialize design/weight columns once (narrow projection + cache)
    # so the sufficient-stats and sandwich passes aggregate plain
    # attributes instead of re-deriving them from the scan each pass.
    from mrt_data_integration_spark.estimators.core import prepare

    computed: dict[str, Column] = {
        "__y__": y_c.cast("double"),
        "__a__": a_c.cast("double"),
        "__w__": w_and_tilt,
        "__pa__": p_tgt_a,
    }
    for i, (_, c) in enumerate(x_h):
        computed[f"__h_{i}__"] = _c(c).cast("double")
    for j, (_, s) in enumerate(moderators):
        computed[f"__r_{j}__"] = (a_centered * _c(s)).cast("double")
        computed[f"__raw_{j}__"] = _c(s).cast("double")
    df = prepare(df, computed, keep=[cluster_col], persist=False)
    y_c, a_c = F.col("__y__"), F.col("__a__")
    w_and_tilt = F.col("__w__")
    p_tgt_a = F.col("__pa__")

    design: list[Column] = [F.col(f"__h_{i}__") for i in range(d_h)] + [
        F.col(f"__r_{j}__") for j in range(d_r)
    ]

    if d_hr <= 8:
        # One-scan sufficient-statistics path (see _one_scan_fit): WLS,
        # Hessian, and cluster meat all from a single pass over the data.
        beta, gram, n, hessian, meat, n_users = _one_scan_fit(
            df,
            design,
            y_c,
            w_and_tilt,
            cluster_col,
            d_h,
            estimate_p,
            a=a_c if estimate_p else None,
            p_hat=p_hat_val if estimate_p else None,
            p_tgt_a=p_tgt_a if estimate_p else None,
            raw_cols=[F.col(f"__raw_{j}__") for j in range(d_r)] if estimate_p else None,
        )
        beta_h, beta_r = beta[:d_h], beta[d_h:]
        sandwich = final_sandwich_step(hessian, meat, n_users, d)
        pos_r = slice(d - d_r, d)
        var_beta_r = sandwich[pos_r, pos_r]
        se_beta_r = se_from_var(var_beta_r)
        if beta_r_true is not None:
            err = beta_r - np.asarray(beta_r_true, dtype=float)
            z = err / se_beta_r
            chi2 = chi2_stat(err, var_beta_r)
        else:
            z = np.full(d_r, np.nan)
            chi2 = float("nan")
        return WclsFit(
            beta_r=beta_r,
            se_beta_r=se_beta_r,
            var_beta_r=var_beta_r,
            beta_h=beta_h,
            beta_r_z_scores=z,
            beta_r_chi2=chi2,
            sandwich=sandwich,
            n=n,
            n_users=n_users,
            p=d,
            r_names=r_names,
            h_names=h_names,
        )

    # Pass 2: WLS sufficient statistics (Arrow partial reduction —
    # the gram doubles as the WLS Hessian block).
    from mrt_data_integration_spark.estimators.core import wls_fit

    beta, gram, n = wls_fit(df, design, y_c, weight=w_and_tilt)
    beta_h, beta_r = beta[:d_h], beta[d_h:]

    # Pass 3: scores, meat, and cross-Hessian in one cluster-partitioned
    # reduction (shared SandwichBuilder).
    from mrt_data_integration_spark.estimators.core import (
        add_propensity_cross_block,
    )
    from mrt_data_integration_spark.estimators.mest import SandwichBuilder

    fitted = derive.linear_predictor(list(beta), design)
    resid = y_c - fitted
    wres = w_and_tilt * resid

    b = SandwichBuilder(d, cluster_col=cluster_col)
    pos_beta = list(range(d_alpha, d))
    if estimate_p:
        b.set_score(0, a_c - p_tgt)
        b.add_hessian_expr(0, 0, p_tgt * (1.0 - p_tgt))
    for i in range(d_hr):
        b.set_score(pos_beta[i], wres * design[i])
    b.add_hessian_block_const(range(d_alpha, d), range(d_alpha, d), gram)
    if estimate_p:
        add_propensity_cross_block(
            b,
            alpha_pos=0,
            stage_pos=pos_beta,
            design=design,
            n_nuisance=d_h,
            raw_cols=[F.col(f"__raw_{j}__") for j in range(d_r)],
            beta_mod=beta_r,
            p=p_tgt,
            p_a=p_tgt_a,
            a=a_c,
            weight=w_and_tilt,
            wres=wres,
        )
    hessian, meat, n_users = b.assemble(df)

    sandwich = final_sandwich_step(hessian, meat, n_users, d)
    pos_r = slice(d - d_r, d)
    var_beta_r = sandwich[pos_r, pos_r]
    se_beta_r = se_from_var(var_beta_r)
    if beta_r_true is not None:
        err = beta_r - np.asarray(beta_r_true, dtype=float)
        z = err / se_beta_r
        chi2 = chi2_stat(err, var_beta_r)
    else:
        z = np.full(d_r, np.nan)
        chi2 = float("nan")

    return WclsFit(
        beta_r=beta_r,
        se_beta_r=se_beta_r,
        var_beta_r=var_beta_r,
        beta_h=beta_h,
        beta_r_z_scores=z,
        beta_r_chi2=chi2,
        sandwich=sandwich,
        n=n,
        n_users=n_users,
        p=d,
        r_names=r_names,
        h_names=h_names,
    )
