"""ET-WCLS — exponential-tilting WCLS (SURVEY.md §2.5 M3).

Semantics parity: methods/etwcls.R:99-225. Pipeline (all O(n) work as
Spark aggregations; see estimators/wcls.py for the pass structure):

  1. intercept-only propensity  (avg(a) — closed-form binomial MLE);
  2. tilt-model ladder: logistic IRLS on tensor-spline features of
     (x1, x2) with the df=3→2→1 warning fallback (core.fit_tilt_ladder);
  3. WLS of y ~ X_h + a_centered·S with weight w·tilt;
  4. joint M-estimation sandwich stacking (α, ω, β_h, β_r) — the tilt
     equation's scores/Hessian enter exactly as at etwcls.R:50-57,85;
  5. pool the internal/external β_r halves: 'full' (joint precision),
     'kronecker' (reduced 2×2 precision), or 'equal' (fixed ½ weights).

Physical note: all design/weight columns are materialized ONCE into a
cached working frame (core.prepare); every subsequent pass aggregates
flat attributes. Without this, the ~800 aggregate expressions of the
sandwich each re-inline the spline trees and Catalyst analysis time —
not data — dominates (306 s → seconds at test scale).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.core import (
    add_propensity_cross_block,
    fit_tilt_ladder,
    linear_combo,
    prepare,
    wls_fit,
)
from mrt_data_integration_spark.estimators.mest import SandwichBuilder
from mrt_data_integration_spark.estimators.wcls import ColumnLike, DesignSpec, WclsFit, _c
from mrt_data_integration_spark.functions import derive
from mrt_data_integration_spark.linalg import (
    chi2_stat,
    final_sandwich_step,
    pool_full,
    pool_two_block_weights,
    se_from_var,
)


def etwcls(
    df: DataFrame,
    x_h: DesignSpec,
    moderators: DesignSpec,
    y: ColumnLike = "y",
    a: ColumnLike = "a",
    p_behavior_a: ColumnLike = "p_h_a",
    is_internal: ColumnLike = "is_internal",
    tilt_x: tuple[str, str] = ("x1", "x2"),
    pooling: str = "full",
    cluster_col: str = "user_id",
    beta_r_true: np.ndarray | None = None,
) -> WclsFit:
    """``moderators`` are the RAW causal design columns (X_r/a_centered,
    e.g. [is_int, is_int*x1, is_ext, is_ext*x1]); the first half must be
    the internal block and the second half the external block (the
    pooling step combines the halves)."""
    y_c, a_c = _c(y).cast("double"), _c(a).cast("double")
    int_flag = _c(is_internal).cast("boolean")

    # 1. intercept-only propensity (etwcls.R:103-108).
    p_hat = float(df.agg(F.avg(a_c)).collect()[0][0])
    p_tgt = F.lit(p_hat)
    a_centered = a_c - p_tgt
    p_tgt_a = derive.observed_arm_prob(a_c, p_tgt)
    w = p_tgt_a / _c(p_behavior_a)

    # 2. tilt ladder (etwcls.R:112-137).
    tilt = fit_tilt_ladder(df, is_internal=int_flag, x1=tilt_x[0], x2=tilt_x[1])
    d_om = tilt.d
    d_h, d_r = len(x_h), len(moderators)
    d_hr = d_h + d_r

    # Materialize everything every later pass touches, once.
    raw_exprs = [_c(c).cast("double") for _, c in moderators]
    computed: dict[str, F.Column] = {
        "__y__": y_c,
        "__a__": a_c,
        "__int__": int_flag.cast("double"),
        "__w__": w,
        "__pa__": p_tgt_a,
    }
    for k, c in enumerate(tilt.design):
        computed[f"__om_{k}__"] = c
    for i, (_, c) in enumerate(x_h):
        computed[f"__h_{i}__"] = _c(c).cast("double")
    for j, r in enumerate(raw_exprs):
        computed[f"__r_{j}__"] = a_centered * r
        computed[f"__raw_{j}__"] = r
    work = prepare(df, computed, keep=[cluster_col])

    om = [F.col(f"__om_{k}__") for k in range(d_om)]
    design = [F.col(f"__h_{i}__") for i in range(d_h)] + [
        F.col(f"__r_{j}__") for j in range(d_r)
    ]
    raw_cols = [F.col(f"__raw_{j}__") for j in range(d_r)]
    y_w, a_w = F.col("__y__"), F.col("__a__")
    int_w = F.col("__int__")
    w_w = F.col("__w__")
    tilt_ratios = F.when(int_w == 1.0, F.lit(1.0)).otherwise(
        F.exp(linear_combo(tilt.omega, om))
    )
    w_and_tilt = w_w * tilt_ratios

    # 3. WLS (etwcls.R:139-148).
    beta, gram, n = wls_fit(work, design, y_w, weight=w_and_tilt)
    beta_h, beta_r = beta[:d_h], beta[d_h:]

    # 4. sandwich (etwcls_sandwich, etwcls.R:2-97).
    d = 1 + d_om + d_hr
    b = SandwichBuilder(d, cluster_col=cluster_col)
    pos_alpha = 0
    pos_omega = list(range(1, 1 + d_om))
    pos_beta = list(range(1 + d_om, d))

    b.set_score(pos_alpha, a_w - p_tgt)
    b.add_hessian_expr(pos_alpha, pos_alpha, p_tgt * (1.0 - p_tgt))

    rho = tilt.pi_internal / (1.0 - tilt.pi_internal)
    p_om_num = F.lit(rho) * F.exp(linear_combo(tilt.omega, om))
    p_om = p_om_num / (1.0 + p_om_num)
    for k in range(d_om):
        b.set_score(pos_omega[k], (int_w - p_om) * om[k])
    # Tilt-equation Hessian block = the IRLS gram at the MLE
    # (p_omega equals the glm fitted mu) — reuse, don't re-sum.
    b.add_hessian_block_const(
        range(pos_omega[0], pos_omega[0] + d_om),
        range(pos_omega[0], pos_omega[0] + d_om),
        tilt.gram,
    )

    resid = y_w - linear_combo(beta, design)
    wres = w_and_tilt * resid
    for i in range(d_hr):
        b.set_score(pos_beta[i], wres * design[i])
    b.add_hessian_block_const(range(pos_beta[0], d), range(pos_beta[0], d), gram)

    add_propensity_cross_block(
        b,
        alpha_pos=pos_alpha,
        stage_pos=pos_beta,
        design=design,
        n_nuisance=d_h,
        raw_cols=raw_cols,
        beta_mod=beta_r,
        p=p_tgt,
        p_a=F.col("__pa__"),
        a=a_w,
        weight=w_and_tilt,
        wres=wres,
    )
    ext_w = 1.0 - int_w
    for i in range(d_hr):
        ew = ext_w * wres * design[i]
        for j in range(d_om):
            b.add_hessian_expr(pos_beta[i], pos_omega[j], -(ew * om[j]))

    hessian, meat, n_users = b.assemble(work)
    work.unpersist()
    sandwich = final_sandwich_step(hessian, meat, n_users, d)
    var_beta_r = sandwich[np.ix_(pos_beta[d_h:], pos_beta[d_h:])]

    # 5. pooling (etwcls.R:169-206).
    if pooling == "full":
        beta_pooled, var_pooled = pool_full(beta_r, var_beta_r, 2)
    elif pooling == "kronecker":
        lam = np.linalg.inv(var_beta_r)
        lam_tilde = np.array([[lam[0, 0], lam[0, 2]], [lam[2, 0], lam[2, 2]]])
        beta_pooled, var_pooled = pool_two_block_weights(beta_r, var_beta_r, lam_tilde)
    elif pooling == "equal":
        beta_pooled, var_pooled = pool_two_block_weights(
            beta_r, var_beta_r, np.eye(2) * 0.5
        )
    else:
        raise ValueError("pooling must be 'full', 'kronecker', or 'equal'")

    se = se_from_var(var_pooled)
    if beta_r_true is not None:
        err = beta_pooled - np.asarray(beta_r_true, dtype=float)
        z, chi2 = err / se, chi2_stat(err, var_pooled)
    else:
        z, chi2 = np.full(len(se), np.nan), float("nan")

    return WclsFit(
        beta_r=beta_pooled,
        se_beta_r=se,
        var_beta_r=var_pooled,
        beta_h=beta_h,
        beta_r_z_scores=z,
        beta_r_chi2=chi2,
        sandwich=sandwich,
        n=n,
        n_users=n_users,
        p=d,
        r_names=[n_ for n_, _ in moderators[: len(se)]],
        h_names=[n_ for n_, _ in x_h],
        tilt_warning=tilt.warning,
    )
