"""DR-WCLS — doubly-robust WCLS (SURVEY.md §2.5 M4).

Semantics parity: methods/drwcls.R:142-280. Pipeline:

  1. intercept-only propensity p_s = avg(a);
  2. stage-1 WLS  y ~ X_h + a_centered·S  with weight p_s_a/p_h_a;
  3. counterfactual predictions f_h_1/f_h_0 and the DR pseudo-outcome
     ỹ = (y − f_h_a)/(a − (1 − p_h)) + S·β_s — pure column expressions
     over one scan (no table cloning, drwcls.R:161-176);
  4. tilt ladder (shared with ET-WCLS);
  5. two target fits: internal OLS of ỹ ~ X_r, and the external
     tilt-weighted moment estimator β_r_et (drwcls.R:214-223);
  6. joint sandwich over (α_s, β_h, β_s, ω, π, β_r, β_r_et), d≈29;
  7. precision-pool the two target estimates ('full' mode).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.core import (
    add_propensity_cross_block,
    fit_tilt_ladder,
    linear_combo,
    masked,
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
    se_from_var,
    solve_wls,
)


def drwcls(
    df: DataFrame,
    x_h: DesignSpec,
    s_moderators: DesignSpec,
    r_moderators: DesignSpec,
    y: ColumnLike = "y",
    a: ColumnLike = "a",
    p_behavior: ColumnLike = "p_h",
    is_internal: ColumnLike = "is_internal",
    tilt_x: tuple[str, str] = ("x1", "x2"),
    cluster_col: str = "user_id",
    beta_r_true: np.ndarray | None = None,
) -> WclsFit:
    """``p_behavior`` is the KNOWN behavior-policy probability column
    P(A=1|H) (the pseudo-outcome denominator needs the probability
    itself, not just the observed-arm probability)."""
    y_c, a_c = _c(y).cast("double"), _c(a).cast("double")
    int_flag = _c(is_internal).cast("boolean")
    p_h = _c(p_behavior).cast("double")
    p_h_a = derive.observed_arm_prob(a_c, p_h)

    # 1. intercept-only propensity (drwcls.R:145-150).
    p_s = float(df.agg(F.avg(a_c)).collect()[0][0])
    p_s_c = F.lit(p_s)
    a_centered = a_c - p_s_c
    p_s_a = derive.observed_arm_prob(a_c, p_s_c)
    w = p_s_a / p_h_a

    # 4. tilt ladder first (it only needs raw covariates).
    tilt = fit_tilt_ladder(df, is_internal=int_flag, x1=tilt_x[0], x2=tilt_x[1])
    d_om = tilt.d
    d_h, d_s, d_r = len(x_h), len(s_moderators), len(r_moderators)

    # Materialized working frame.
    s_raw = [_c(c).cast("double") for _, c in s_moderators]
    computed: dict[str, F.Column] = {
        "__y__": y_c,
        "__a__": a_c,
        "__int__": int_flag.cast("double"),
        "__w__": w,
        "__psa__": p_s_a,
        "__denom__": a_c - (1.0 - p_h),
    }
    for k, c in enumerate(tilt.design):
        computed[f"__om_{k}__"] = c
    for i, (_, c) in enumerate(x_h):
        computed[f"__h_{i}__"] = _c(c).cast("double")
    for j, s in enumerate(s_raw):
        computed[f"__s_{j}__"] = a_centered * s
        computed[f"__sraw_{j}__"] = s
    for k, (_, c) in enumerate(r_moderators):
        computed[f"__xr_{k}__"] = _c(c).cast("double")
    work = prepare(df, computed, keep=[cluster_col])

    om = [F.col(f"__om_{k}__") for k in range(d_om)]
    h_cols = [F.col(f"__h_{i}__") for i in range(d_h)]
    s_cols = [F.col(f"__s_{j}__") for j in range(d_s)]
    sraw_cols = [F.col(f"__sraw_{j}__") for j in range(d_s)]
    xr = [F.col(f"__xr_{k}__") for k in range(d_r)]
    y_w, a_w, int_w, w_w = (
        F.col("__y__"),
        F.col("__a__"),
        F.col("__int__"),
        F.col("__w__"),
    )
    ext_w = 1.0 - int_w
    denom = F.col("__denom__")
    design_hs = h_cols + s_cols

    tilt_ratios = F.when(int_w == 1.0, F.lit(1.0)).otherwise(
        F.exp(linear_combo(tilt.omega, om))
    )
    pi = tilt.pi_internal

    # 2. stage-1 WLS (drwcls.R:152-160) with BOTH stage-2 estimators'
    # sufficient statistics fused into the same scan:
    #   - internal OLS: the response Sβ_s is linear in β_s ⇒ only β-free
    #     moments X_rᵀX_r and X_rᵀS over internal rows;
    #   - external tilt-weighted RHS (drwcls.R:214-223, was a separate
    #     pass through round 3): frac = (y − f_h_a)/denom is LINEAR in
    #     β_hs (f_h_a = X_hβ_h + (a−p_s)·Sβ_s = design_hs·β_hs), and the
    #     tilt ratios are known before the scan (the ladder runs first),
    #     so Σ e·x_r·tilt·frac expands into the β-free moments
    #     rey_k = Σ e·x_r_k·tilt·y/denom and
    #     rem_km = Σ e·x_r_k·tilt·design_m/denom.
    # Net: every coefficient estimate in the fit derives from ONE pass
    # over the working frame; only the d≈29 sandwich needs its own pass.
    d_hs = d_h + d_s
    moments: dict[str, F.Column] = {}
    for i in range(d_r):
        for j in range(i, d_r):
            moments[f"gr_{i}_{j}"] = int_w * xr[i] * xr[j]
    for i in range(d_r):
        for j in range(d_s):
            moments[f"xs_{i}_{j}"] = int_w * xr[i] * sraw_cols[j]
    for k in range(d_r):
        moments[f"rey_{k}"] = ext_w * xr[k] * tilt_ratios * y_w / denom
        for m in range(d_hs):
            moments[f"rem_{k}_{m}"] = (
                ext_w * xr[k] * tilt_ratios * design_hs[m] / denom
            )
    beta_hs, gram_hs, n, mom = wls_fit(
        work, design_hs, y_w, weight=w_w, extra_moments=moments
    )
    beta_h, beta_s = beta_hs[:d_h], beta_hs[d_h:]

    # 3. counterfactuals & pseudo-outcome (drwcls.R:161-176).
    ce = linear_combo(beta_s, sraw_cols)  # f_h_1 − f_h_0
    h_fit = linear_combo(beta_h, h_cols)
    f_h_1 = h_fit + (1.0 - p_s_c) * ce
    f_h_0 = h_fit - p_s_c * ce
    f_h_a = a_w * f_h_1 + (1.0 - a_w) * f_h_0
    frac = (y_w - f_h_a) / denom
    y_tilde = frac + ce

    # 5a. internal OLS (drwcls.R:210-212) from the moments fused into
    # the stage-1 scan. NOTE the reference regresses the fitted causal
    # effect S·β_s on X_r here (r_formula's response is
    # wcls_s_causal_effects), while the sandwich score for this block
    # uses the DR pseudo-outcome ỹ (drwcls.R:104) — replicated as-is.
    gram_r_int = np.zeros((d_r, d_r))
    for i in range(d_r):
        for j in range(i, d_r):
            gram_r_int[i, j] = gram_r_int[j, i] = mom[f"gr_{i}_{j}"]
    xs_mat = np.array(
        [[mom[f"xs_{i}_{j}"] for j in range(d_s)] for i in range(d_r)]
    )
    beta_r = solve_wls(gram_r_int, xs_mat @ beta_s)

    # 5b. external tilt-weighted moment estimator (drwcls.R:214-223),
    # assembled from the moments fused into the stage-1 scan:
    # rin_k = Σ i·x_r_k·Sβ_s = [XᵀS]_k β_s and rex_k = rey_k − rem_k·β_hs.
    rhs = np.array(
        [
            float(xs_mat[k] @ beta_s) / pi
            + (
                mom[f"rey_{k}"]
                - sum(
                    float(beta_hs[m]) * mom[f"rem_{k}_{m}"]
                    for m in range(d_hs)
                )
            )
            / (1.0 - pi)
            for k in range(d_r)
        ]
    )
    beta_r_et = solve_wls(gram_r_int / pi, rhs)

    # 6. joint sandwich (dr_sandwich, drwcls.R:1-140).
    d = 1 + d_h + d_s + d_om + 1 + 2 * d_r
    b = SandwichBuilder(d, cluster_col=cluster_col)
    pos_as = 0
    pos_h = list(range(1, 1 + d_h))
    pos_s = list(range(1 + d_h, 1 + d_h + d_s))
    pos_hs = pos_h + pos_s
    pos_om = list(range(1 + d_h + d_s, 1 + d_h + d_s + d_om))
    pos_pi = 1 + d_h + d_s + d_om
    pos_r = list(range(pos_pi + 1, pos_pi + 1 + d_r))
    pos_et = list(range(pos_pi + 1 + d_r, d))

    b.set_score(pos_as, a_w - p_s_c)
    b.add_hessian_expr(pos_as, pos_as, p_s_c * (1.0 - p_s_c))

    resid = y_w - linear_combo(beta_hs, design_hs)
    wres = w_w * resid
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
        raw_cols=sraw_cols,
        beta_mod=beta_s,
        p=p_s_c,
        p_a=F.col("__psa__"),
        a=a_w,
        weight=w_w,
        wres=wres,
    )

    rho = pi / (1.0 - pi)
    p_om_num = F.lit(rho) * F.exp(linear_combo(tilt.omega, om))
    p_om = p_om_num / (1.0 + p_om_num)
    for k in range(d_om):
        b.set_score(pos_om[k], (int_w - p_om) * om[k])
    # Tilt-equation Hessian block = the IRLS gram at the MLE
    # (p_omega equals the glm fitted mu) — reuse, don't re-sum.
    b.add_hessian_block_const(
        range(pos_om[0], pos_om[0] + d_om),
        range(pos_om[0], pos_om[0] + d_om),
        tilt.gram,
    )

    b.set_score(pos_pi, int_w - F.lit(pi))
    b.add_hessian_const(pos_pi, pos_pi, float(n))

    r_resid = y_tilde - linear_combo(beta_r, xr)
    int_mask = int_w == 1.0
    for i in range(d_r):
        b.set_score(pos_r[i], masked(int_mask, r_resid * xr[i]))
        for j in range(d_h):
            b.add_hessian_expr(
                pos_r[i], pos_h[j], masked(int_mask, xr[i] * h_cols[j] / denom)
            )
        for j in range(d_s):
            b.add_hessian_expr(
                pos_r[i],
                pos_s[j],
                masked(int_mask, xr[i] * (s_cols[j] / denom - sraw_cols[j])),
            )
    b.add_hessian_block_const(range(pos_r[0], pos_r[0] + d_r), range(pos_r[0], pos_r[0] + d_r), gram_r_int)

    et_resid_int = ce - linear_combo(beta_r_et, xr)
    et_score_core = (
        ext_w * tilt_ratios * (y_w - f_h_a) / (denom * F.lit(1.0 - pi))
        + int_w * et_resid_int / F.lit(pi)
    )
    for i in range(d_r):
        b.set_score(pos_et[i], et_score_core * xr[i])
        for j in range(d_om):
            b.add_hessian_expr(
                pos_et[i],
                pos_om[j],
                -(ext_w * tilt_ratios * frac * xr[i] * om[j]) / F.lit(1.0 - pi),
            )
        for j in range(d_h):
            b.add_hessian_expr(
                pos_et[i],
                pos_h[j],
                (ext_w * tilt_ratios / denom) * xr[i] * h_cols[j] / F.lit(1.0 - pi),
            )
        for j in range(d_s):
            b.add_hessian_expr(
                pos_et[i],
                pos_s[j],
                (ext_w * tilt_ratios / denom) * xr[i] * s_cols[j] / F.lit(1.0 - pi)
                - masked(int_mask, xr[i] * sraw_cols[j]) / F.lit(pi),
            )
        b.add_hessian_expr(
            pos_et[i],
            pos_pi,
            (
                F.lit(-((1.0 - pi) ** -2)) * ext_w * tilt_ratios * frac
                + F.lit(pi**-2) * int_w * et_resid_int
            )
            * xr[i],
        )
    b.add_hessian_block_const(
        range(pos_et[0], d), range(pos_et[0], d), gram_r_int / pi
    )

    hessian, meat, n_users = b.assemble(work)
    work.unpersist()
    sandwich = final_sandwich_step(hessian, meat, n_users, d)

    # 7. pool β_r and β_r_et ('full', drwcls.R:248-262).
    pos_both = pos_r + pos_et
    var_both = sandwich[np.ix_(pos_both, pos_both)]
    beta_pooled, var_pooled = pool_full(
        np.concatenate([beta_r, beta_r_et]), var_both, 2
    )
    se = se_from_var(var_pooled)
    if beta_r_true is not None:
        err = beta_pooled - np.asarray(beta_r_true, dtype=float)
        z, chi2 = err / se, chi2_stat(err, var_pooled)
    else:
        z, chi2 = np.full(d_r, np.nan), float("nan")

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
        r_names=[n_ for n_, _ in r_moderators],
        h_names=[n_ for n_, _ in x_h],
        tilt_warning=tilt.warning,
    )
