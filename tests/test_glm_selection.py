"""Logistic IRLS and AIC model selection (M7, M12)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.glm import logistic_irls, select_by_aic


def _sim_df(spark, n=4000, seed=11):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(n)
    p = 1 / (1 + np.exp(-(0.5 + 1.2 * x)))
    y = (rng.uniform(size=n) < p).astype(float)
    return spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )


def test_irls_recovers_coefficients(spark):
    df = _sim_df(spark).cache()
    fit = logistic_irls(df, [F.lit(1.0), F.col("x")], F.col("y"))
    assert fit.converged and not fit.warning
    np.testing.assert_allclose(fit.beta, [0.5, 1.2], atol=0.15)
    df.unpersist()


def test_aic_selects_true_model(spark):
    df = _sim_df(spark).cache()
    candidates = {
        "intercept_only": [F.lit(1.0)],
        "linear": [F.lit(1.0), F.col("x")],
        "overfit_cubic": [
            F.lit(1.0),
            F.col("x"),
            F.col("x") * F.col("x"),
            F.col("x") * F.col("x") * F.col("x"),
        ],
    }
    name, fit = select_by_aic(df, candidates, F.col("y"))
    assert name == "linear"
    assert fit.aic < len(df.columns) * 1e9
    df.unpersist()