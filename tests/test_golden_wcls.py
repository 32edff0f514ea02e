"""Golden-file parity: run the distributed WCLS estimator on the
reference's committed example_dat.csv (seed pinned upstream) and compare
beta_r / se_beta_r to example_estimates.csv.

Clustering note (SURVEY.md §1.3): the reference's default balanced-path
sandwich clusters CONSECUTIVE t_max-row blocks of the frame (an array
reshape over time-major data — extras/helpers.R:7-15), which is not
user_id clustering. To reproduce the golden numbers bit-for-bit we pass
a block-derived cluster key computed from the CSV's explicit row-index
column (never Spark row order). The engine's standard path clusters by
user_id; a companion test asserts that path runs and differs (i.e. we
did not silently inherit the quirk).
"""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators import drwcls, etwcls, petwcls, pwcls, wcls

GOLDEN_DIR = "/root/reference"
DAT = os.path.join(GOLDEN_DIR, "example_dat.csv")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DAT), reason="reference golden data not present"
)

# example_estimates.csv (seed=1), per method: (Intercept, Slope).
GOLDEN = {
    "WCLS-Internal": {"beta": (-1.876, 6.355), "se": (1.259, 1.379)},
    "WCLS-Pooled": {"beta": (-0.738, 4.281), "se": (0.751, 0.794)},
    "P-WCLS-Internal": {"beta": (-1.814, 6.321), "se": (1.276, 1.385)},
    "P-WCLS-Pooled": {"beta": (-2.363, 6.07), "se": (0.98, 0.994)},
    "P-WCLS-Pooled-Obs": {"beta": (-2.441, 6.272), "se": (0.988, 1.037)},
    "ET-WCLS-Equal": {"beta": (-1.802, 5.688), "se": (1.514, 1.682)},
    "ET-WCLS-Kron": {"beta": (-1.826, 5.924), "se": (1.238, 1.365)},
    "ET-WCLS": {"beta": (-2.003, 6.028), "se": (1.11, 1.22)},
    "DR-WCLS": {"beta": (-2.164, 5.944), "se": (1.157, 1.286)},
    "PET-WCLS": {"beta": (-2.561, 5.817), "se": (0.964, 0.959)},
}

X_H = lambda: [  # noqa: E731
    ("intercept", F.lit(1.0)),
    ("x1", F.col("x1")),
    ("x2", F.col("x2")),
    ("x3", F.col("x3")),
]
MODS = lambda: [("one", F.lit(1.0)), ("x1", F.col("x1"))]  # noqa: E731


def _load_panel(spark):
    df = spark.read.csv(DAT, header=True, inferSchema=True)
    idx_col = df.columns[0]  # R's unnamed row-index column
    return df.select(
        F.col(idx_col).cast("long").alias("row_idx"),
        F.col("is_internal").cast("boolean").alias("is_internal"),
        *[F.col(c).cast("double").alias(c) for c in ["x1", "x2", "x3", "p_h", "p_h_a", "a", "y"]],
        F.col("user_id").cast("long").alias("user_id"),
    )


def _block_cluster(df, t_max=20):
    """Reference balanced-path cluster key: consecutive t_max-row blocks
    in original file order (derived from the explicit row index, then
    re-ranked after any filter — exactly what array(scores, dim=...)
    does to the filtered frame)."""
    from pyspark.sql import Window

    w = Window.orderBy("row_idx")
    return df.withColumn(
        "block_cluster", ((F.row_number().over(w) - 1) / t_max).cast("long")
    )


def _fit(df, cluster_col):
    return wcls(
        df,
        x_h=X_H(),
        moderators=MODS(),
        y="y",
        a="a",
        p_behavior_a="p_h_a",
        p_target=None,  # estimate intercept-only propensity (a ~ 1)
        cluster_col=cluster_col,
        beta_r_true=np.array([-2.0, 5.0]),
    )


S_MODS = lambda: [  # noqa: E731
    ("one", F.lit(1.0)),
    ("x1", F.col("x1")),
    ("x2", F.col("x2")),
]
P_H_DESIGN = lambda: [  # noqa: E731
    ("intercept", F.lit(1.0)),
    ("is_internal_num", F.col("is_internal").cast("double")),
    ("x1", F.col("x1")),
    ("x2", F.col("x2")),
    ("x3", F.col("x3")),
]


def _et_designs():
    i = F.col("is_internal").cast("double")
    e = 1.0 - F.col("is_internal").cast("double")
    x_h = [
        ("int", i), ("int_x1", i * F.col("x1")),
        ("int_x2", i * F.col("x2")), ("int_x3", i * F.col("x3")),
        ("ext", e), ("ext_x1", e * F.col("x1")),
        ("ext_x2", e * F.col("x2")), ("ext_x3", e * F.col("x3")),
    ]
    mods = [
        ("int_ac", i), ("int_ac_x1", i * F.col("x1")),
        ("ext_ac", e), ("ext_ac_x1", e * F.col("x1")),
    ]
    return x_h, mods


def _fit_method(panel, method, cluster_col):
    kw = dict(
        y="y", a="a", p_behavior_a="p_h_a",
        cluster_col=cluster_col, beta_r_true=np.array([-2.0, 5.0]),
    )
    if method == "WCLS-Internal":
        return wcls(panel.filter(F.col("is_internal")), x_h=X_H(), moderators=MODS(), p_target=None, **kw)
    if method == "WCLS-Pooled":
        return wcls(panel, x_h=X_H(), moderators=MODS(), p_target=None, **kw)
    if method == "P-WCLS-Internal":
        return pwcls(panel, x_h=X_H(), s_moderators=S_MODS(), r_moderators=MODS(), internal_only=True, **kw)
    if method == "P-WCLS-Pooled":
        return pwcls(panel, x_h=X_H(), s_moderators=S_MODS(), r_moderators=MODS(), **kw)
    if method == "P-WCLS-Pooled-Obs":
        return pwcls(panel, x_h=X_H(), s_moderators=S_MODS(), r_moderators=MODS(), p_h_design=P_H_DESIGN(), **kw)
    if method.startswith("ET-WCLS"):
        pooling = {"ET-WCLS-Equal": "equal", "ET-WCLS-Kron": "kronecker", "ET-WCLS": "full"}[method]
        x_h, mods = _et_designs()
        return etwcls(panel, x_h=x_h, moderators=mods, pooling=pooling, **kw)
    if method == "DR-WCLS":
        kw2 = {k: v for k, v in kw.items() if k != "p_behavior_a"}
        return drwcls(
            panel, x_h=X_H(), s_moderators=S_MODS(), r_moderators=MODS(),
            p_behavior="p_h", **kw2,
        )
    if method == "PET-WCLS":
        _, et_mods = _et_designs()
        return petwcls(
            panel, x_h=X_H(), s_moderators=S_MODS(), et_moderators=et_mods,
            r_moderators=MODS(), **kw,
        )
    raise ValueError(method)


@pytest.mark.parametrize("method", sorted(GOLDEN.keys()))
def test_golden_estimates(spark, method):
    panel = _load_panel(spark)
    if method == "WCLS-Internal":
        # filter happens inside _fit_method; block clustering must be
        # computed on the FILTERED frame for this method.
        panel_f = _block_cluster(panel.filter(F.col("is_internal"))).cache()
        fit = wcls(
            panel_f, x_h=X_H(), moderators=MODS(), y="y", a="a",
            p_behavior_a="p_h_a", p_target=None, cluster_col="block_cluster",
            beta_r_true=np.array([-2.0, 5.0]),
        )
        panel_f.unpersist()
    else:
        panel_b = _block_cluster(panel).cache()
        fit = _fit_method(panel_b, method, "block_cluster")
        panel_b.unpersist()
    exp = GOLDEN[method]
    np.testing.assert_allclose(fit.beta_r, exp["beta"], atol=6e-4)
    np.testing.assert_allclose(fit.se_beta_r, exp["se"], atol=6e-4)


def test_user_cluster_path_differs(spark):
    """Engine-standard user_id clustering runs and yields different SEs
    than the reference's block quirk (documented intentional deviation)."""
    panel = _load_panel(spark).cache()
    fit_user = _fit(panel, "user_id")
    fit_block = _fit(_block_cluster(panel), "block_cluster")
    np.testing.assert_allclose(fit_user.beta_r, fit_block.beta_r, atol=1e-9)
    assert not np.allclose(fit_user.se_beta_r, fit_block.se_beta_r, atol=1e-6)
    panel.unpersist()


def test_awcls_distributed_matches_local(spark):
    """Differential: distributed A-WCLS == numpy twin on the golden
    panel (block clustering, matching the reference's conventions)."""
    import pandas as pd

    from mrt_data_integration_spark.estimators.awcls import awcls
    from mrt_data_integration_spark.estimators.local import awcls_np

    pdf = pd.read_csv(DAT)
    pdf["is_internal"] = pdf["is_internal"].astype(bool)
    fit_np = awcls_np(pdf)

    panel = _block_cluster(_load_panel(spark)).cache()
    fit = awcls(
        panel,
        x_h=X_H(),
        s_moderators=[("one", F.lit(1.0)), ("x1", F.col("x1")), ("x2", F.col("x2"))],
        cluster_col="block_cluster",
    )
    panel.unpersist()
    np.testing.assert_allclose(fit.beta_r, fit_np.beta_r, rtol=1e-8)
    np.testing.assert_allclose(fit.se_beta_r, fit_np.se_beta_r, rtol=1e-6)


def test_pwcls_one_scan_matches_generic(spark):
    """The round-4 one-scan P-WCLS path (single pass: both stages +
    sandwich from per-cluster sufficient stats) must agree with the
    generic two-pass path to float precision on every output."""
    panel = _load_panel(spark)
    kw = dict(
        x_h=X_H(), s_moderators=S_MODS(), r_moderators=MODS(),
        y="y", a="a", p_behavior_a="p_h_a", cluster_col="user_id",
    )
    for internal_only in (False, True):
        fast = pwcls(panel, internal_only=internal_only, one_scan=True, **kw)
        slow = pwcls(panel, internal_only=internal_only, one_scan=False, **kw)
        np.testing.assert_allclose(fast.beta_r, slow.beta_r, rtol=1e-9)
        np.testing.assert_allclose(fast.beta_h, slow.beta_h, rtol=1e-9)
        np.testing.assert_allclose(fast.se_beta_r, slow.se_beta_r, rtol=1e-8)
        np.testing.assert_allclose(fast.sandwich, slow.sandwich, rtol=1e-7, atol=1e-12)
        assert fast.n == slow.n and fast.n_users == slow.n_users


def test_pwcls_one_scan_distributed_fallback_matches(spark, monkeypatch):
    """Force collect_cluster_stats down the persisted-distributed branch
    (never hit at test data scale) and pin it against the driver-collect
    branch — the meat fallback agg must produce identical numbers."""
    import importlib

    pw = importlib.import_module("mrt_data_integration_spark.estimators.pwcls")

    panel = _load_panel(spark)
    kw = dict(
        x_h=X_H(), s_moderators=S_MODS(), r_moderators=MODS(),
        y="y", a="a", p_behavior_a="p_h_a", cluster_col="user_id",
        one_scan=True,
    )
    fast = pwcls(panel, **kw)
    # relative baseline: earlier tests' localCheckpoint blocks may still
    # be registered until the ContextCleaner GCs them
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    monkeypatch.setattr(pw, "_FORCE_MAX_CLUSTERS", 1)
    slow = pwcls(panel, **kw)
    np.testing.assert_allclose(fast.beta_r, slow.beta_r, rtol=1e-10)
    np.testing.assert_allclose(fast.se_beta_r, slow.se_beta_r, rtol=1e-9)
    np.testing.assert_allclose(fast.sandwich, slow.sandwich, rtol=1e-8, atol=1e-12)
    assert fast.n_users == slow.n_users
    # fallback must not leak its persisted lvl1 frame (no net growth)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= baseline


def test_wcls_one_scan_distributed_fallback_matches(spark, monkeypatch):
    """Same fallback pin for wcls's one-scan meat agg."""
    import importlib

    wc = importlib.import_module("mrt_data_integration_spark.estimators.wcls")
    panel = _load_panel(spark)
    fast = _fit(panel, "user_id")
    baseline = spark.sparkContext._jsc.getPersistentRDDs().size()
    monkeypatch.setattr(wc, "_FORCE_MAX_CLUSTERS", 1)
    slow = _fit(panel, "user_id")
    np.testing.assert_allclose(fast.beta_r, slow.beta_r, rtol=1e-10)
    np.testing.assert_allclose(fast.se_beta_r, slow.se_beta_r, rtol=1e-9)
    np.testing.assert_allclose(fast.sandwich, slow.sandwich, rtol=1e-8, atol=1e-12)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= baseline
