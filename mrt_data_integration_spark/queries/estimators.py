"""Regression / estimator queries (SURVEY.md §2.5 M1/M8/M9) with SQL
oracles. The flagship ``wcls_cluster_robust`` runs the REAL distributed
WCLS estimator (sufficient stats + two-level meat + sandwich) and is
checked against a closed-form 2×2 normal-equation + sandwich oracle in
pure SQL — the reference's differential-testing practice
(extras/fast-meat.cpp:53-69) generalized across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators import drwcls, etwcls, petwcls, pwcls, wcls
from mrt_data_integration_spark.queries.derived import _PANEL_SQL, _panelized
from mrt_data_integration_spark.queries.registry import query
from mrt_data_integration_spark.sources import load_table


# One cached panel per (session, sf_dir) — the whole estimator family
# (pwcls/etwcls/drwcls/awcls/petwcls/report) reads the SAME deterministic
# panel, so releasing it between queries (the r5 leak fix's first cut)
# made every query redo the JSON-parse projection. A keyed singleton is
# the bounded middle ground: at most ONE panel stays cached, replaced
# (and unpersisted) when the key changes, exempt from the registry sweep.
_PANEL_CACHE: dict = {}


def _mrt_panel(spark: SparkSession, sf_dir: str):
    """events → full MRT-panel stand-in with covariates for the tilt
    model (x1, x2), outcome y, treatment a, and known behavior policy.

    Multi-pass estimators (tilt knots + IRLS + WLS + sandwich) re-scan
    this panel many times; the JSON parse for x2 makes re-derivation the
    dominant cost. Cached once per (session, sf_dir) — see _PANEL_CACHE.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _PANEL_CACHE.get(key)
    if hit is not None:
        return hit
    df = _panelized(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("double")
    panel = (
        df.withColumn("y", F.col("value"))
        .withColumn("x1", F.log1p(F.col("value")))
        .withColumn("x2", k / 50.0)
        .withColumn("p_h_col", F.col("p_h"))
    )
    cached = panel.select(
        "user_id", "y", "a", "x1", "x2", "p_h_a", "p_h_col", "is_internal"
    ).cache()
    for old_key in list(_PANEL_CACHE):
        try:
            _PANEL_CACHE.pop(old_key).unpersist()
        except Exception:
            pass  # prior session already stopped
    _PANEL_CACHE[key] = cached
    return cached


def _fit_to_df(spark, fit, method: str):
    rows = [
        (method, name, round(float(b), 4), round(float(s), 4))
        for name, b, s in zip(fit.r_names, fit.beta_r, fit.se_beta_r)
    ]
    return spark.createDataFrame(
        rows, "method string, coef string, estimate double, se double"
    )


def _std_designs():
    x_h = [("intercept", F.lit(1.0)), ("x1", F.col("x1")), ("x2", F.col("x2"))]
    mods = [("one", F.lit(1.0)), ("x1", F.col("x1"))]
    s_mods = [("one", F.lit(1.0)), ("x1", F.col("x1")), ("x2", F.col("x2"))]
    i = F.col("is_internal").cast("double")
    e = 1.0 - F.col("is_internal").cast("double")
    et_mods = [
        ("int", i), ("int_x1", i * F.col("x1")),
        ("ext", e), ("ext_x1", e * F.col("x1")),
    ]
    return x_h, mods, s_mods, et_mods


@query("pwcls_fit")
def pwcls_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M2: pooled two-stage P-WCLS on the events panel (rows-only check:
    joint matrix solve is not SQL-expressible)."""
    x_h, mods, s_mods, _ = _std_designs()
    fit = pwcls(_mrt_panel(spark, sf_dir), x_h=x_h, s_moderators=s_mods, r_moderators=mods)
    return _fit_to_df(spark, fit, "pwcls")


@query("etwcls_fit")
def etwcls_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M3: exponential-tilting WCLS (spline tilt ladder + IRLS + joint
    sandwich + full precision pooling) on the events panel."""
    _, mods, _, et_mods = _std_designs()
    i = F.col("is_internal").cast("double")
    e = 1.0 - i
    x_h = [
        ("int", i), ("int_x1", i * F.col("x1")), ("int_x2", i * F.col("x2")),
        ("ext", e), ("ext_x1", e * F.col("x1")), ("ext_x2", e * F.col("x2")),
    ]
    fit = etwcls(_mrt_panel(spark, sf_dir), x_h=x_h, moderators=et_mods)
    return _fit_to_df(spark, fit, "etwcls")


@query("drwcls_fit")
def drwcls_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4: doubly-robust WCLS (counterfactual pseudo-outcomes + two
    pooled target estimates) on the events panel."""
    x_h, mods, s_mods, _ = _std_designs()
    fit = drwcls(
        _mrt_panel(spark, sf_dir),
        x_h=x_h, s_moderators=s_mods, r_moderators=mods, p_behavior="p_h_col",
    )
    return _fit_to_df(spark, fit, "drwcls")


@query("awcls_fit")
def awcls_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M6: assisted WCLS (auxiliary cubic regression + Γ coefficient
    mapping + delta-method variance) on the events panel."""
    from mrt_data_integration_spark.estimators.awcls import awcls

    x_h, _, s_mods, _ = _std_designs()
    fit = awcls(_mrt_panel(spark, sf_dir), x_h=x_h, s_moderators=s_mods)
    return _fit_to_df(spark, fit, "awcls")


@query("estimator_report_pivot")
def estimator_report_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2+W7: the reference's reporting artifact (example-analysis.R:
    51-58) — per-method "estimate (se)" strings pivoted to one column
    per method, built from the fast estimators' results."""
    x_h, mods, s_mods, _ = _std_designs()
    panel = _mrt_panel(spark, sf_dir)
    fits = {
        "wcls_pooled": wcls(
            panel, x_h=x_h, moderators=mods, p_target=None
        ),
        "pwcls_pooled": pwcls(
            panel, x_h=x_h, s_moderators=s_mods, r_moderators=mods
        ),
    }
    rows = []
    for method, fit in fits.items():
        for name, b, s in zip(fit.r_names, fit.beta_r, fit.se_beta_r):
            rows.append((method, name, float(b), float(s)))
    long = spark.createDataFrame(
        rows, "method string, coef string, estimate double, se double"
    )
    label = F.format_string("%.3f (%.3f)", F.col("estimate"), F.col("se"))
    piv = (
        long.withColumn("label", label)
        .groupBy("coef")
        .pivot("method", sorted(fits))
        .agg(F.first("label"))
    )
    return piv


@query("petwcls_fit")
def petwcls_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M5: pooled + exponential-tilting WCLS (three-way precision
    pooling, d=~30 joint sandwich) on the events panel."""
    x_h, mods, s_mods, et_mods = _std_designs()
    fit = petwcls(
        _mrt_panel(spark, sf_dir),
        x_h=x_h, s_moderators=s_mods, et_moderators=et_mods, r_moderators=mods,
    )
    return _fit_to_df(spark, fit, "petwcls")


@query(
    "regr_by_group",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity), 4)     AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
           round(corr(l_extendedprice, l_quantity), 4)           AS r,
           count(*)                                              AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def regr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8 (1-regressor): per-group OLS via the SQL regression aggregates
    — the cross-check oracle for the sufficient-stats WLS path."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("intercept"),
        F.round(F.corr("l_extendedprice", "l_quantity"), 4).alias("r"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "wls_normal_equations",
    oracle="""
    WITH s AS (
      SELECT sum(1.0/(1.0+l_discount))                                    AS sw,
             sum(l_quantity/(1.0+l_discount))                             AS swx,
             sum(l_quantity*l_quantity/(1.0+l_discount))                  AS swxx,
             sum(l_extendedprice/(1.0+l_discount))                        AS swy,
             sum(l_quantity*l_extendedprice/(1.0+l_discount))             AS swxy
      FROM lineitem
    )
    SELECT round((sw*swxy - swx*swy) / (sw*swxx - swx*swx), 4)            AS slope,
           round((swy - (sw*swxy - swx*swy)/(sw*swxx - swx*swx)*swx)/sw, 4) AS intercept,
           round(sw, 4)                                                   AS sum_w
    FROM s
    """,
)
def wls_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M8: weighted least squares ``price ~ quantity`` with weight
    1/(1+discount), solved from ONE sufficient-statistics aggregation —
    the engine's WLS physical plan, with the 2×2 solve expressed as
    column arithmetic so the oracle can replicate it exactly."""
    li = load_table(spark, sf_dir, "lineitem")
    w = 1.0 / (1.0 + F.col("l_discount"))
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.agg(
        F.sum(w).alias("sw"),
        F.sum(w * x).alias("swx"),
        F.sum(w * x * x).alias("swxx"),
        F.sum(w * y).alias("swy"),
        F.sum(w * x * y).alias("swxy"),
    )
    det = F.col("sw") * F.col("swxx") - F.col("swx") * F.col("swx")
    slope = (F.col("sw") * F.col("swxy") - F.col("swx") * F.col("swy")) / det
    return s.select(
        F.round(slope, 4).alias("slope"),
        F.round((F.col("swy") - slope * F.col("swx")) / F.col("sw"), 4).alias("intercept"),
        F.round(F.col("sw"), 4).alias("sum_w"),
    )


@query(
    "wcls_cluster_robust",
    oracle=f"""
    WITH panel AS ({_PANEL_SQL}),
    d AS (
      SELECT user_id, value AS y, a - 0.5 AS ac, 0.5 / p_h_a AS w
      FROM panel
    ),
    s AS (
      SELECT sum(w) AS sw, sum(w*ac) AS swa, sum(w*ac*ac) AS swaa,
             sum(w*y) AS swy, sum(w*ac*y) AS sway
      FROM d
    ),
    beta AS (
      SELECT (swaa*swy - swa*sway)/(sw*swaa - swa*swa) AS b0,
             (sw*sway - swa*swy)/(sw*swaa - swa*swa)   AS b1
      FROM s
    ),
    user_scores AS (
      SELECT user_id,
             sum(w*(y - b0 - b1*ac))      AS u0,
             sum(w*(y - b0 - b1*ac) * ac) AS u1
      FROM d, beta
      GROUP BY user_id
    ),
    meat AS (
      SELECT sum(u0*u0) AS m00, sum(u0*u1) AS m01, sum(u1*u1) AS m11,
             count(*) AS nu
      FROM user_scores
    ),
    fin AS (
      SELECT b0, b1, m00, m01, m11, nu, sw, swa, swaa,
             (sw*swaa - swa*swa) AS det
      FROM beta, meat, s
    )
    SELECT 'intercept' AS coef, round(b0, 4) AS estimate,
           round(sqrt((swaa*swaa*m00 - 2*swaa*swa*m01 + swa*swa*m11)
                      / (det*det) * nu / (nu - 2.0)), 4) AS se
    FROM fin
    UNION ALL
    SELECT 'a_centered' AS coef, round(b1, 4) AS estimate,
           round(sqrt((swa*swa*m00 - 2*sw*swa*m01 + sw*sw*m11)
                      / (det*det) * nu / (nu - 2.0)), 4) AS se
    FROM fin
    """,
)
def wcls_cluster_robust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1 (known-randomization WCLS, d=2): the REAL distributed estimator
    — ``estimators.wcls`` with target probability 0.5 and intercept-only
    designs — against a fully closed-form SQL sandwich oracle.

    Exercises: derived weight chain (P3-P8), sufficient-stats WLS (M8,
    A3), residual scores (P9-P10), two-level cluster meat (A1-A2), and
    the sandwich assembly (L1-L2) end to end.
    """
    import math

    df = _panelized(spark, sf_dir).withColumn("y", F.col("value"))
    fit = wcls(
        df,
        x_h=[("intercept", F.lit(1.0))],
        moderators=[("a_centered", F.lit(1.0))],
        y="y",
        a="a",
        p_behavior_a="p_h_a",
        p_target=0.5,
        cluster_col="user_id",
    )
    rows = [
        ("intercept", round(float(fit.beta_h[0]), 4), round(math.sqrt(fit.sandwich[0, 0]), 4)),
        ("a_centered", round(float(fit.beta_r[0]), 4), round(float(fit.se_beta_r[0]), 4)),
    ]
    return spark.createDataFrame(rows, "coef string, estimate double, se double")
