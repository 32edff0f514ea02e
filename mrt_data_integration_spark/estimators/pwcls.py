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


# test hook: set to a small int to force collect_cluster_stats down the
# persisted-distributed fallback (never hit at test data scale otherwise)
_FORCE_MAX_CLUSTERS: int | None = None


def _one_scan_pwcls(
    data: DataFrame,
    design_hs: list[F.Column],
    s_raw: list[F.Column],
    x_r: list[F.Column],
    stage2_mask: F.Column,
    y: F.Column,
    w: F.Column,
    a: F.Column,
    p_s: float,
    p_s_a: F.Column,
    cluster_col: str,
    d_h: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, np.ndarray, np.ndarray, int]:
    """ONE-scan P-WCLS (non-observational): stage-1 WLS, stage-2 OLS,
    the stacked (α_s, β_hs, β_r) Hessian, and the cluster meat all from
    a single pass over the panel — the same per-cluster
    sufficient-statistics design as ``wcls._one_scan_fit`` (every score
    is linear in the unknown coefficients, so per-cluster β-free moments
    suffice), sharing its probe/fallback via
    ``core.collect_cluster_stats``.

    Stats per cluster, all β-free:
      - stage-1: G_u = Σ w·x·xᵀ, c_u = Σ w·x·y, n_u, Σa;
      - propensity cross block (wcls.R:94-97 / pwcls.R:98-101 expansion):
        S1_k, S2_ij, S3_kj, S4_j exactly as in ``wcls._one_scan_fit``
        with raw_cols = S (the stage-1 moderators);
      - stage-2 (masked to internal rows): GR_u = Σ m·x_r·x_rᵀ and
        XS_u = Σ m·x_r·Sᵀ, because the stage-2 response Sβ_s and its
        residual score x_r·(Sβ_s − X_rβ_r) are linear in (β_s, β_r):
        score sums are XS_u β_s − GR_u β_r, and the stage-2↔stage-1
        cross-Hessian −Σ m·x_r·Sᵀ is just −XS.

    Returns (beta_hs, gram_hs, beta_r, gram_r, n, hessian, meat,
    n_users).
    """
    from mrt_data_integration_spark.estimators.core import collect_cluster_stats

    d_hs, d_s, d_r = len(design_hs), len(s_raw), len(x_r)
    d = 1 + d_hs + d_r

    ldp = (-(2.0 * a - 1.0) * p_s * (1.0 - p_s)) / p_s_a
    m2 = stage2_mask.cast("double")
    cols = [
        F.col(cluster_col).alias("__cluster__"),
        *[x.cast("double").alias(f"__x_{i}__") for i, x in enumerate(design_hs)],
        y.cast("double").alias("__y__"),
        w.cast("double").alias("__w__"),
        a.cast("double").alias("__a__"),
        ldp.alias("__ldp__"),
        m2.alias("__m__"),
        *[r.cast("double").alias(f"__raw_{j}__") for j, r in enumerate(s_raw)],
        *[r.cast("double").alias(f"__xr_{k}__") for k, r in enumerate(x_r)],
    ]
    proj = data.select(*cols)

    def _x(i: int) -> str:
        return f"__x_{i}__"

    # SQL-string aggs (one py4j round-trip each) over fixed projection
    # names — same rationale as wcls._one_scan_fit.
    aggs: list[F.Column] = []
    aggs += [F.expr(f"sum(__w__*{_x(i)}*{_x(j)}) AS g_{i}_{j}")
             for i in range(d_hs) for j in range(i, d_hs)]
    aggs += [F.expr(f"sum(__w__*{_x(i)}*__y__) AS c_{i}") for i in range(d_hs)]
    aggs.append(F.expr("cast(count(1) AS double) AS n_u"))
    aggs.append(F.expr("sum(__a__) AS sa"))
    aggs += [F.expr(f"sum({_x(k)}*__w__*__y__*__ldp__) AS s1_{k}")
             for k in range(d_hs)]
    aggs += [F.expr(f"sum({_x(i)}*__w__*{_x(j)}*__ldp__) AS s2_{i}_{j}")
             for i in range(d_hs) for j in range(i, d_hs)]
    aggs += [F.expr(f"sum(__w__*{_x(k)}*__raw_{j}__) AS s3_{k}_{j}")
             for k in range(d_hs) for j in range(d_s)]
    aggs += [F.expr(f"sum(__raw_{j}__*__w__*__y__) AS s4_{j}")
             for j in range(d_s)]
    aggs += [F.expr(f"sum(__m__*__xr_{i}__*__xr_{j}__) AS gr_{i}_{j}")
             for i in range(d_r) for j in range(i, d_r)]
    aggs += [F.expr(f"sum(__m__*__xr_{i}__*__raw_{j}__) AS xs_{i}_{j}")
             for i in range(d_r) for j in range(d_s)]

    lvl1 = proj.groupBy("__cluster__").agg(*aggs)
    stat_names = [c for c in lvl1.columns if c != "__cluster__"]
    stats, g, n_users, persisted = collect_cluster_stats(
        lvl1, stat_names, max_clusters=_FORCE_MAX_CLUSTERS
    )
    if persisted is not None:
        lvl1 = persisted
    n = int(round(g["n_u"]))

    gram_hs = np.zeros((d_hs, d_hs))
    for i in range(d_hs):
        for j in range(i, d_hs):
            gram_hs[i, j] = gram_hs[j, i] = g[f"g_{i}_{j}"]
    xty = np.array([g[f"c_{i}"] for i in range(d_hs)])
    beta_hs = solve_wls(gram_hs, xty)
    beta_s = beta_hs[d_h:]

    gram_r = np.zeros((d_r, d_r))
    for i in range(d_r):
        for j in range(i, d_r):
            gram_r[i, j] = gram_r[j, i] = g[f"gr_{i}_{j}"]
    xs_mat = np.array(
        [[g[f"xs_{i}_{j}"] for j in range(d_s)] for i in range(d_r)]
    )
    beta_r = solve_wls(gram_r, xs_mat @ beta_s)

    # Hessian — positions (α_s | β_hs | β_r), mirroring the
    # SandwichBuilder layout of the generic path.
    hessian = np.zeros((d, d))
    hessian[0, 0] = p_s * (1.0 - p_s) * n
    hessian[1 : 1 + d_hs, 1 : 1 + d_hs] = gram_hs
    pd_const = -(1.0 - p_s)
    s2 = np.zeros((d_hs, d_hs))
    for i in range(d_hs):
        for j in range(i, d_hs):
            s2[i, j] = s2[j, i] = g[f"s2_{i}_{j}"]
    s3 = np.array([[g[f"s3_{k}_{j}"] for j in range(d_s)] for k in range(d_hs)])
    for k in range(d_hs):
        t = g[f"s1_{k}"] - float(s2[k] @ beta_hs)
        t += p_s * pd_const * float(s3[k] @ beta_s)
        if k >= d_h:
            j = k - d_h
            t += -p_s * pd_const * (g[f"s4_{j}"] - float(s3[:, j] @ beta_hs))
        hessian[1 + k, 0] = t
    for i in range(d_r):
        for j in range(d_s):
            hessian[1 + d_hs + i, 1 + d_h + j] = -xs_mat[i, j]
    hessian[1 + d_hs :, 1 + d_hs :] = gram_r

    # Meat: per-cluster scores are linear in the level-1 stats with the
    # coefficients now known.
    if stats is not None:
        col_ix = {nm: k for k, nm in enumerate(stat_names)}
        sc = np.empty((n_users, d))
        sc[:, 0] = stats[:, col_ix["sa"]] - stats[:, col_ix["n_u"]] * p_s
        for i in range(d_hs):
            v = stats[:, col_ix[f"c_{i}"]].copy()
            for m in range(d_hs):
                nm = f"g_{i}_{m}" if i <= m else f"g_{m}_{i}"
                v -= float(beta_hs[m]) * stats[:, col_ix[nm]]
            sc[:, 1 + i] = v
        for r in range(d_r):
            v = np.zeros(n_users)
            for j in range(d_s):
                v += float(beta_s[j]) * stats[:, col_ix[f"xs_{r}_{j}"]]
            for m in range(d_r):
                nm = f"gr_{r}_{m}" if r <= m else f"gr_{m}_{r}"
                v -= float(beta_r[m]) * stats[:, col_ix[nm]]
            sc[:, 1 + d_hs + r] = v
        meat = sc.T @ sc
        return beta_hs, gram_hs, beta_r, gram_r, n, hessian, meat, n_users

    # Distributed fallback: one more tiny agg over the persisted frame.
    def score_hs(i: int) -> F.Column:
        expr = F.col(f"c_{i}")
        for m in range(d_hs):
            nm = f"g_{i}_{m}" if i <= m else f"g_{m}_{i}"
            expr = expr - F.lit(float(beta_hs[m])) * F.col(nm)
        return expr

    def score_r(r: int) -> F.Column:
        expr = F.lit(0.0)
        for j in range(d_s):
            expr = expr + F.lit(float(beta_s[j])) * F.col(f"xs_{r}_{j}")
        for m in range(d_r):
            nm = f"gr_{r}_{m}" if r <= m else f"gr_{m}_{r}"
            expr = expr - F.lit(float(beta_r[m])) * F.col(nm)
        return expr

    scores = [F.col("sa") - F.col("n_u") * F.lit(p_s)]
    scores += [score_hs(i) for i in range(d_hs)]
    scores += [score_r(r) for r in range(d_r)]
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
    return beta_hs, gram_hs, beta_r, gram_r, n, hessian, meat, n_users


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
    one_scan: bool | None = None,
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

    use_one_scan = (
        (d_h + d_s <= 8) if one_scan is None else one_scan
    ) and not observational
    if use_one_scan:
        # One-scan path (small designs, known behavior policy): the whole
        # fit — both stages + sandwich — is a single pass over the panel,
        # sharing wcls's per-cluster probe/fallback. The generic two-pass
        # path below stays the plan for wide designs (agg width grows
        # ~d², Janino compile would dominate) and the observational
        # variant (the logistic p_h block's cross terms are not linear
        # in a driver-known coefficient set).
        (beta_hs, gram_hs, beta_r, gram_r, n, hessian, meat, n_users) = (
            _one_scan_pwcls(
                data,
                design_hs,
                s_raw,
                x_r,
                stage2_mask,
                y_c,
                w,
                a_c,
                p_s,
                p_s_a,
                cluster_col,
                d_h,
            )
        )
        beta_h, beta_s = beta_hs[:d_h], beta_hs[d_h:]
        d = 1 + d_h + d_s + d_r
        sandwich = final_sandwich_step(hessian, meat, n_users, d)
        pos_r_ix = list(range(1 + d_h + d_s, d))
        var_beta_r = sandwich[np.ix_(pos_r_ix, pos_r_ix)]
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
