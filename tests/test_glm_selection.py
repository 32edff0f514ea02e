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

def test_irls_driver_collect_matches_distributed(spark, sf_smoke):
    """Round-4 probe path: driver-collected IRLS must equal the
    distributed mapInPandas IRLS on every output."""
    import numpy as np
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.estimators.glm import logistic_irls
    from mrt_data_integration_spark.sources import load_table

    ev = load_table(spark, sf_smoke, "events").select(
        F.lit(1.0).alias("one"),
        F.col("value").cast("double").alias("v"),
        (F.col("event_id") % 2 == 0).cast("double").alias("y"),
    )
    xs = [F.col("one"), F.col("v")]
    fast = logistic_irls(ev, xs, F.col("y"), driver_collect=True)
    slow = logistic_irls(ev, xs, F.col("y"), driver_collect=False)
    np.testing.assert_allclose(fast.beta, slow.beta, rtol=1e-10)
    assert fast.n_iter == slow.n_iter
    assert fast.converged == slow.converged and fast.warning == slow.warning
    np.testing.assert_allclose(fast.deviance, slow.deviance, rtol=1e-10)
    np.testing.assert_allclose(fast.final_gram, slow.final_gram, rtol=1e-9)
