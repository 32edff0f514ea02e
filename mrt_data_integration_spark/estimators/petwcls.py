"""PET-WCLS — pooled + exponential-tilting WCLS (SURVEY.md §2.5 M5),
the reference paper's best-performing estimator.

Semantics parity: methods/petwcls.R:141-264. Composition of three fits
sharing one scan:

  1. intercept-only propensity p_s = avg(a);
  2. tilt ladder (shared IRLS/spline machinery);
  3. β_hs:  WLS  y ~ X_h + a_c·S        weight w            (no tilt);
  4. β_hr:  WLS  y ~ X_h + a_c·R_et     weight w·tilt  (R_et = the
     internal/external moderator blocks — petwcls.R:192-200);
  5. β_r:   OLS  S·β_s ~ X_r  on internal rows;
  6. joint sandwich over (α_s, ω, β_h, β_s, β_h', β_r_wcls, β_r),
     d = 1 + d_ω + 2·d_h + d_s + 3·d_r (= 34 in the paper config);
  7. precision-pool THREE β_r blocks (internal-tilted, external-tilted,
     stage-2) — petwcls.R:232-246.
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


def petwcls(
    df: DataFrame,
    x_h: DesignSpec,
    s_moderators: DesignSpec,
    et_moderators: DesignSpec,
    r_moderators: DesignSpec,
    y: ColumnLike = "y",
    a: ColumnLike = "a",
    p_behavior_a: ColumnLike = "p_h_a",
    is_internal: ColumnLike = "is_internal",
    tilt_x: tuple[str, str] = ("x1", "x2"),
    cluster_col: str = "user_id",
    beta_r_true: np.ndarray | None = None,
) -> WclsFit:
    """``et_moderators``: RAW internal/external moderator blocks
    ([is_int, is_int*x1, is_ext, is_ext*x1]) — first half internal,
    second half external; 2·d_r columns total."""
    y_c, a_c = _c(y).cast("double"), _c(a).cast("double")
    int_flag = _c(is_internal).cast("boolean")

    p_s = float(df.agg(F.avg(a_c)).collect()[0][0])
    p_s_c = F.lit(p_s)
    a_centered = a_c - p_s_c
    p_s_a = derive.observed_arm_prob(a_c, p_s_c)
    w = p_s_a / _c(p_behavior_a)

    tilt = fit_tilt_ladder(df, is_internal=int_flag, x1=tilt_x[0], x2=tilt_x[1])
    d_om = tilt.d
    d_h, d_s = len(x_h), len(s_moderators)
    d_r = len(r_moderators)
    d_et = len(et_moderators)
    assert d_et == 2 * d_r, "et_moderators must hold 2 blocks of d_r columns"

    s_raw = [_c(c).cast("double") for _, c in s_moderators]
    et_raw = [_c(c).cast("double") for _, c in et_moderators]
    computed: dict[str, F.Column] = {
        "__y__": y_c,
        "__a__": a_c,
        "__int__": int_flag.cast("double"),
        "__w__": w,
        "__psa__": p_s_a,
    }
    for k, c in enumerate(tilt.design):
        computed[f"__om_{k}__"] = c
    for i, (_, c) in enumerate(x_h):
        computed[f"__h_{i}__"] = _c(c).cast("double")
    for j, s in enumerate(s_raw):
        computed[f"__s_{j}__"] = a_centered * s
        computed[f"__sraw_{j}__"] = s
    for j, r in enumerate(et_raw):
        computed[f"__e_{j}__"] = a_centered * r
        computed[f"__eraw_{j}__"] = r
    for k, (_, c) in enumerate(r_moderators):
        computed[f"__xr_{k}__"] = _c(c).cast("double")
    work = prepare(df, computed, keep=[cluster_col])

    om = [F.col(f"__om_{k}__") for k in range(d_om)]
    h_cols = [F.col(f"__h_{i}__") for i in range(d_h)]
    s_cols = [F.col(f"__s_{j}__") for j in range(d_s)]
    sraw_cols = [F.col(f"__sraw_{j}__") for j in range(d_s)]
    e_cols = [F.col(f"__e_{j}__") for j in range(d_et)]
    eraw_cols = [F.col(f"__eraw_{j}__") for j in range(d_et)]
    xr = [F.col(f"__xr_{k}__") for k in range(d_r)]
    y_w, a_w, int_w, w_w = (
        F.col("__y__"),
        F.col("__a__"),
        F.col("__int__"),
        F.col("__w__"),
    )
    ext_w = 1.0 - int_w
    tilt_ratios = F.when(int_w == 1.0, F.lit(1.0)).otherwise(
        F.exp(linear_combo(tilt.omega, om))
    )
    w_and_tilt = w_w * tilt_ratios

    # 3. β_hs (petwcls.R:180-190) with the stage-2 internal-OLS moments
    # (X_rᵀX_r, X_rᵀS over internal rows — β-free because the stage-2
    # response Sβ_s is linear in β_s) fused into the same scan.
    int_mask = int_w == 1.0
    design_hs = h_cols + s_cols
    moments: dict[str, F.Column] = {}
    for i in range(d_r):
        for j in range(i, d_r):
            moments[f"gr_{i}_{j}"] = int_w * xr[i] * xr[j]
    for i in range(d_r):
        for j in range(d_s):
            moments[f"xs_{i}_{j}"] = int_w * xr[i] * sraw_cols[j]
    beta_hs, gram_hs, n, mom = wls_fit(
        work, design_hs, y_w, weight=w_w, extra_moments=moments
    )
    beta_h, beta_s = beta_hs[:d_h], beta_hs[d_h:]
    ce = linear_combo(beta_s, sraw_cols)

    # 4. β_hr (petwcls.R:192-200).
    design_hr = h_cols + e_cols
    beta_hr_full, gram_hr, _ = wls_fit(work, design_hr, y_w, weight=w_and_tilt)
    beta_h_r, beta_r_wcls = beta_hr_full[:d_h], beta_hr_full[d_h:]

    # 5. β_r: stage-2 OLS on internal (petwcls.R:202-206), solved from
    # the fused moments — zero extra scans.
    gram_r_int = np.zeros((d_r, d_r))
    for i in range(d_r):
        for j in range(i, d_r):
            gram_r_int[i, j] = gram_r_int[j, i] = mom[f"gr_{i}_{j}"]
    xs_mat = np.array(
        [[mom[f"xs_{i}_{j}"] for j in range(d_s)] for i in range(d_r)]
    )
    beta_r = solve_wls(gram_r_int, xs_mat @ beta_s)

    # 6. joint sandwich (petwcls_sandwich, petwcls.R:1-139).
    d = 1 + d_om + d_h + d_s + d_h + d_et + d_r
    b = SandwichBuilder(d, cluster_col=cluster_col)
    pos_as = 0
    pos_om = list(range(1, 1 + d_om))
    pos_h = list(range(1 + d_om, 1 + d_om + d_h))
    pos_s = list(range(1 + d_om + d_h, 1 + d_om + d_h + d_s))
    pos_hs = pos_h + pos_s
    pos_h2 = list(range(pos_s[-1] + 1, pos_s[-1] + 1 + d_h))
    pos_rw = list(range(pos_h2[-1] + 1, pos_h2[-1] + 1 + d_et))
    pos_hr = pos_h2 + pos_rw
    pos_r = list(range(pos_rw[-1] + 1, d))

    b.set_score(pos_as, a_w - p_s_c)
    b.add_hessian_expr(pos_as, pos_as, p_s_c * (1.0 - p_s_c))

    rho = tilt.pi_internal / (1.0 - tilt.pi_internal)
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

    resid_hs = y_w - linear_combo(beta_hs, design_hs)
    wres_hs = w_w * resid_hs
    for i in range(d_h + d_s):
        b.set_score(pos_hs[i], wres_hs * design_hs[i])
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
        wres=wres_hs,
    )

    resid_hr = y_w - linear_combo(beta_hr_full, design_hr)
    wres_hr = w_and_tilt * resid_hr
    for i in range(d_h + d_et):
        b.set_score(pos_hr[i], wres_hr * design_hr[i])
    b.add_hessian_block_const(
        range(pos_hr[0], pos_hr[0] + d_h + d_et),
        range(pos_hr[0], pos_hr[0] + d_h + d_et),
        gram_hr,
    )
    add_propensity_cross_block(
        b,
        alpha_pos=pos_as,
        stage_pos=pos_hr,
        design=design_hr,
        n_nuisance=d_h,
        raw_cols=eraw_cols,
        beta_mod=beta_r_wcls,
        p=p_s_c,
        p_a=F.col("__psa__"),
        a=a_w,
        weight=w_and_tilt,
        wres=wres_hr,
    )
    for i in range(d_h + d_et):
        ew = ext_w * wres_hr * design_hr[i]
        for j in range(d_om):
            b.add_hessian_expr(pos_hr[i], pos_om[j], -(ew * om[j]))

    r_resid = ce - linear_combo(beta_r, xr)
    for i in range(d_r):
        b.set_score(pos_r[i], masked(int_mask, r_resid * xr[i]))
        for j in range(d_s):
            b.add_hessian_expr(
                pos_r[i], pos_s[j], masked(int_mask, -(xr[i] * sraw_cols[j]))
            )
    b.add_hessian_block_const(range(pos_r[0], d), range(pos_r[0], d), gram_r_int)

    hessian, meat, n_users = b.assemble(work)
    work.unpersist()
    sandwich = final_sandwich_step(hessian, meat, n_users, d)

    # 7. three-block pooling (petwcls.R:232-246).
    pos_pool = pos_rw + pos_r
    var_pool_block = sandwich[np.ix_(pos_pool, pos_pool)]
    beta_stacked = np.concatenate([beta_r_wcls, beta_r])
    beta_pooled, var_pooled = pool_full(beta_stacked, var_pool_block, 3)
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
