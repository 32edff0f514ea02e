"""P-WCLS — pooled two-stage WCLS (SURVEY.md §2.5 M2).

Semantics parity: methods/pwcls.R:137-254. Stage 1 fits the
S-moderated WCLS on the pooled (or internal-only) panel; each internal
row's fitted causal effect S·β_s becomes the stage-2 response, regressed
on the target moderators X_r by OLS. The joint sandwich stacks
(α_h [observational only], α_s, β_h, β_s, β_r) so stage-2 SEs carry
stage-1 (and propensity) uncertainty.

The observational variant estimates the behavior policy p_h by
multi-covariate logistic IRLS (estimators.glm) — one aggregation pass
per Fisher-scoring iteration.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.core import (
    add_propensity_cross_block,
    linear_combo,
    masked,
    wls_fit,
)
from mrt_data_integration_spark.estimators.glm import logistic_irls, predict_logistic
from mrt_data_integration_spark.estimators.mest import SandwichBuilder
from mrt_data_integration_spark.estimators.wcls import ColumnLike, DesignSpec, WclsFit, _c
from mrt_data_integration_spark.functions import derive
from mrt_data_integration_spark.linalg import (
    chi2_stat,
    final_sandwich_step,
    se_from_var,
    solve_wls,
)


def pwcls(
    df: DataFrame,
    x_h: DesignSpec,
    s_moderators: DesignSpec,
    r_moderators: DesignSpec,
    y: ColumnLike = "y",
    a: ColumnLike = "a",
    p_behavior_a: ColumnLike = "p_h_a",
    is_internal: ColumnLike = "is_internal",
    internal_only: bool = False,
    p_h_design: DesignSpec | None = None,
    cluster_col: str = "user_id",
    beta_r_true: np.ndarray | None = None,
) -> WclsFit:
    """``s_moderators``: stage-1 raw moderator columns S (causal design
    is a_centered·S). ``r_moderators``: stage-2 design X_r (include the
    intercept). ``p_h_design``: design of a logistic behavior-policy
    model (observational variant); None → known p_h_a column."""
    int_flag = _c(is_internal).cast("boolean")
    data = df.filter(int_flag) if internal_only else df
    y_c, a_c = _c(y).cast("double"), _c(a).cast("double")

    # Behavior policy (observational) — pwcls.R:149-156.
    observational = p_h_design is not None
    if observational:
        if internal_only:
            raise NotImplementedError("observational + internal_only")
        x_ah = [_c(c).cast("double") for _, c in p_h_design]
        ph_fit = logistic_irls(data, x_ah, a_c)
        p_h_hat = predict_logistic(ph_fit.beta, x_ah)
        p_h_a_eff = derive.observed_arm_prob(a_c, p_h_hat)
    else:
        p_h_a_eff = _c(p_behavior_a)

    # Target policy p_s: intercept-only binomial MLE (pwcls.R:159-167).
    p_s = float(data.agg(F.avg(a_c)).collect()[0][0])
    p_s_c = F.lit(p_s)
    a_centered = a_c - p_s_c
    p_s_a = derive.observed_arm_prob(a_c, p_s_c)
    w = p_s_a / p_h_a_eff

    # Stage 1 WLS (pwcls.R:183-191) with the stage-2 sufficient
    # statistics FUSED into the same scan: the stage-2 response Sβ_s is
    # linear in β_s, so its normal equations need only the β-free
    # moments X_rᵀX_r and X_rᵀS over the masked rows — summed here as
    # extra_moments instead of a second pass over the table.
    d_h, d_s = len(x_h), len(s_moderators)
    d_r = len(r_moderators)
    s_raw = [_c(c).cast("double") for _, c in s_moderators]
    design_hs = [_c(c).cast("double") for _, c in x_h] + [a_centered * s for s in s_raw]
    x_r = [_c(c).cast("double") for _, c in r_moderators]
    stage2_mask = F.lit(True) if internal_only else int_flag
    m2 = stage2_mask.cast("double")
    moments: dict[str, F.Column] = {}
    for i in range(d_r):
        for j in range(i, d_r):
            moments[f"gr_{i}_{j}"] = m2 * x_r[i] * x_r[j]
    for i in range(d_r):
        for j in range(d_s):
            moments[f"xs_{i}_{j}"] = m2 * x_r[i] * s_raw[j]
    beta_hs, gram_hs, n, mom = wls_fit(
        data, design_hs, y_c, weight=w, extra_moments=moments
    )
    beta_h, beta_s = beta_hs[:d_h], beta_hs[d_h:]

    # Stage 2 OLS of causal effects on X_r, internal rows
    # (pwcls.R:192-216) — solved from the fused moments, zero extra scans.
    ce = linear_combo(beta_s, s_raw)
    gram_r = np.zeros((d_r, d_r))
    for i in range(d_r):
        for j in range(i, d_r):
            gram_r[i, j] = gram_r[j, i] = mom[f"gr_{i}_{j}"]
    xs_mat = np.array(
        [[mom[f"xs_{i}_{j}"] for j in range(d_s)] for i in range(d_r)]
    )
    beta_r = solve_wls(gram_r, xs_mat @ beta_s)

    # Joint sandwich (pwcls_sandwich, pwcls.R:1-135).
    d_ah = len(p_h_design) if observational else 0
    d = d_ah + 1 + d_h + d_s + d_r
    b = SandwichBuilder(d, cluster_col=cluster_col)
    pos_ah = list(range(d_ah))
    pos_as = d_ah
    pos_hs = list(range(d_ah + 1, d_ah + 1 + d_h + d_s))
    pos_r = list(range(d_ah + 1 + d_h + d_s, d))

    if observational:
        for k in range(d_ah):
            b.set_score(pos_ah[k], (a_c - p_h_hat) * x_ah[k])
            for k2 in range(d_ah):
                if k <= k2:
                    e = p_h_hat * (1.0 - p_h_hat) * x_ah[k] * x_ah[k2]
                    b.add_hessian_expr(pos_ah[k], pos_ah[k2], e)
                    if k != k2:
                        b.add_hessian_expr(pos_ah[k2], pos_ah[k], e)
    b.set_score(pos_as, a_c - p_s_c)
    b.add_hessian_expr(pos_as, pos_as, p_s_c * (1.0 - p_s_c))

    resid = y_c - linear_combo(beta_hs, design_hs)
    wres = w * resid
    for i in range(d_h + d_s):
        b.set_score(pos_hs[i], wres * design_hs[i])
    b.add_hessian_block_const(
        range(pos_hs[0], pos_hs[0] + d_h + d_s),
        range(pos_hs[0], pos_hs[0] + d_h + d_s),
        gram_hs,
    )
    add_propensity_cross_block(
        b,
        alpha_pos=pos_as,
        stage_pos=pos_hs,
        design=design_hs,
        n_nuisance=d_h,
        raw_cols=s_raw,
        beta_mod=beta_s,
        p=p_s_c,
        p_a=p_s_a,
        a=a_c,
        weight=w,
        wres=wres,
    )
    if observational:
        logd_h = (-(2.0 * a_c - 1.0) * p_h_hat * (1.0 - p_h_hat)) / p_h_a_eff
        for i in range(d_h + d_s):
            for j in range(d_ah):
                b.add_hessian_expr(
                    pos_hs[i], pos_ah[j], wres * design_hs[i] * logd_h * x_ah[j]
                )

    r_resid = ce - linear_combo(beta_r, x_r)
    for i in range(d_r):
        b.set_score(pos_r[i], masked(stage2_mask, r_resid * x_r[i]))
        for j in range(d_s):
            b.add_hessian_expr(
                pos_r[i], pos_hs[d_h + j], masked(stage2_mask, -(x_r[i] * s_raw[j]))
            )
    b.add_hessian_block_const(range(pos_r[0], d), range(pos_r[0], d), gram_r)

    hessian, meat, n_users = b.assemble(data)
    sandwich = final_sandwich_step(hessian, meat, n_users, d)
    var_beta_r = sandwich[np.ix_(pos_r, pos_r)]
    se = se_from_var(var_beta_r)
    if beta_r_true is not None:
        err = beta_r - np.asarray(beta_r_true, dtype=float)
        z, chi2 = err / se, chi2_stat(err, var_beta_r)
    else:
        z, chi2 = np.full(d_r, np.nan), float("nan")

    return WclsFit(
        beta_r=beta_r,
        se_beta_r=se,
        var_beta_r=var_beta_r,
        beta_h=beta_h,
        beta_r_z_scores=z,
        beta_r_chi2=chi2,
        sandwich=sandwich,
        n=n,
        n_users=n_users,
        p=d,
        r_names=[n_ for n_, _ in r_moderators],
        h_names=[n_ for n_, _ in x_h],
    )
