"""A-WCLS — assisted WCLS, distributed (SURVEY.md §2.5 M6).

Semantics parity: methods/awcls.R:92-183 (the reference marks it "not
checked thoroughly"; implemented for surface completeness). WCLS stage
with intercept-only propensity + auxiliary cubic regression
x2 ~ poly(x1, 3) on internal rows; β_r = Γ β_s with Γ carrying the
fitted γ; delta-method variance J V Jᵀ (awcls.R:161-165).

The reference's own conventions are replicated exactly where they
differ from the rest of the family: the small-sample factor is
n/(n−d) over ROWS (awcls.R:84), and its clustering is the balanced
block reshape — here exposed as the explicit ``cluster_col`` the
caller provides (pass a block key to reproduce reference numbers,
user_id for the engine-standard semantics).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.core import (
    add_propensity_cross_block,
    linear_combo,
    masked,
    prepare,
    wls_fit,
)
from mrt_data_integration_spark.estimators.mest import SandwichBuilder
from mrt_data_integration_spark.estimators.wcls import ColumnLike, DesignSpec, WclsFit, _c
from mrt_data_integration_spark.functions import derive
from mrt_data_integration_spark.linalg import se_from_var, solve_wls


def awcls(
    df: DataFrame,
    x_h: DesignSpec,
    s_moderators: DesignSpec,
    y: ColumnLike = "y",
    a: ColumnLike = "a",
    p_behavior_a: ColumnLike = "p_h_a",
    is_internal: ColumnLike = "is_internal",
    aux_response: ColumnLike = "x2",
    aux_predictor: ColumnLike = "x1",
    cluster_col: str = "user_id",
) -> WclsFit:
    y_c, a_c = _c(y).cast("double"), _c(a).cast("double")
    int_flag = _c(is_internal).cast("boolean")

    p_s = float(df.agg(F.avg(a_c)).collect()[0][0])
    p_s_c = F.lit(p_s)
    a_centered = a_c - p_s_c
    p_s_a = derive.observed_arm_prob(a_c, p_s_c)
    w = p_s_a / _c(p_behavior_a)

    d_h, d_s = len(x_h), len(s_moderators)
    s_raw = [_c(c).cast("double") for _, c in s_moderators]
    x1c = _c(aux_predictor).cast("double")
    computed = {
        "__y__": y_c,
        "__a__": a_c,
        "__int__": int_flag.cast("double"),
        "__w__": w,
        "__psa__": p_s_a,
        "__x2__": _c(aux_response).cast("double"),
        **{f"__h_{i}__": _c(c).cast("double") for i, (_, c) in enumerate(x_h)},
        **{f"__s_{j}__": a_centered * s for j, s in enumerate(s_raw)},
        **{f"__sraw_{j}__": s for j, s in enumerate(s_raw)},
        "__g0__": F.lit(1.0),
        "__g1__": x1c,
        "__g2__": x1c * x1c,
        "__g3__": x1c * x1c * x1c,
    }
    work = prepare(df, computed, keep=[cluster_col], persist=False)
    h_cols = [F.col(f"__h_{i}__") for i in range(d_h)]
    s_cols = [F.col(f"__s_{j}__") for j in range(d_s)]
    sraw_cols = [F.col(f"__sraw_{j}__") for j in range(d_s)]
    g_cols = [F.col(f"__g{k}__") for k in range(4)]
    y_w, a_w, int_w, w_w = (
        F.col("__y__"), F.col("__a__"), F.col("__int__"), F.col("__w__"),
    )
    design_hs = h_cols + s_cols

    # The auxiliary cubic regression x2 ~ poly(x1,3) on internal rows is
    # entirely β-free (raw response, raw design), so its sufficient
    # statistics ride along in the stage-1 scan as extra_moments.
    int_mask = int_w == 1.0
    x2_w = F.col("__x2__")
    moments = {}
    for i in range(4):
        for j in range(i, 4):
            moments[f"gg_{i}_{j}"] = int_w * g_cols[i] * g_cols[j]
        moments[f"gx_{i}"] = int_w * g_cols[i] * x2_w
    beta_hs, gram_hs, n, mom = wls_fit(
        work, design_hs, y_w, weight=w_w, extra_moments=moments
    )
    beta_h, beta_s = beta_hs[:d_h], beta_hs[d_h:]

    gram_g = np.zeros((4, 4))
    for i in range(4):
        for j in range(i, 4):
            gram_g[i, j] = gram_g[j, i] = mom[f"gg_{i}_{j}"]
    gamma = solve_wls(gram_g, np.array([mom[f"gx_{i}"] for i in range(4)]))
    d_r = 4
    Gamma = np.column_stack([np.eye(4)[:, 0], np.eye(4)[:, 1], gamma])
    beta_r = Gamma @ beta_s

    d = 1 + d_h + d_s + d_r
    b = SandwichBuilder(d, cluster_col=cluster_col)
    pos_as = 0
    pos_hs = list(range(1, 1 + d_h + d_s))
    pos_g = list(range(1 + d_h + d_s, d))

    b.set_score(pos_as, a_w - p_s_c)
    b.add_hessian_expr(pos_as, pos_as, p_s_c * (1.0 - p_s_c))
    resid = y_w - linear_combo(beta_hs, design_hs)
    wres = w_w * resid
    for i in range(d_h + d_s):
        b.set_score(pos_hs[i], wres * design_hs[i])
    b.add_hessian_block_const(
        range(1, 1 + d_h + d_s), range(1, 1 + d_h + d_s), gram_hs
    )
    add_propensity_cross_block(
        b, alpha_pos=pos_as, stage_pos=pos_hs, design=design_hs,
        n_nuisance=d_h, raw_cols=sraw_cols, beta_mod=beta_s,
        p=p_s_c, p_a=F.col("__psa__"), a=a_w, weight=w_w, wres=wres,
    )
    g_resid = F.col("__x2__") - linear_combo(gamma, g_cols)
    for k in range(4):
        b.set_score(pos_g[k], masked(int_mask, g_resid * g_cols[k]))
    b.add_hessian_block_const(range(pos_g[0], d), range(pos_g[0], d), gram_g)

    hessian, meat, n_users = b.assemble(work)
    # awcls.R:84 uses n/(n−d) over rows, not users.
    half = np.linalg.solve(hessian, np.linalg.cholesky(meat))
    sandwich = half @ half.T * n / (n - d)

    pos_theta = list(range(1 + d_h, d))
    var_theta = sandwich[np.ix_(pos_theta, pos_theta)]
    J = np.column_stack([Gamma, beta_s[2] * np.eye(d_r)])
    var_r = J @ var_theta @ J.T
    se = se_from_var(var_r)
    return WclsFit(
        beta_r=beta_r,
        se_beta_r=se,
        var_beta_r=var_r,
        beta_h=beta_h,
        beta_r_z_scores=np.full(d_r, np.nan),
        beta_r_chi2=float("nan"),
        sandwich=sandwich,
        n=n,
        n_users=n_users,
        p=d,
        r_names=["g0", "g1", "g2", "g3"],
        h_names=[n_ for n_, _ in x_h],
    )
