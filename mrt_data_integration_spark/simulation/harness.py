"""Monte-Carlo simulation harness (SURVEY.md §2.7 R4-R6, §3.2).

The reference's study is a fully-serial R loop over 13 sample-size
pairs × 400 seeded replications × 10 method variants = 52,000 fits
(simulation.R:116-243). Every cell is independent, so here the whole
study is ONE Spark job: a config-grid DataFrame fans out via
``mapInPandas``; each task generates its replication panel (numpy
generator, seeded per cell) and runs the task-local estimator twins;
results come back as a long-format DataFrame keyed by
(n_internal, n_external, replication, method, coef) — the reference's
4-D result arrays in long form (SURVEY.md §1.2). Summary statistics
are then plain grouped aggregations (mc_summary).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.local import (
    drwcls_np,
    etwcls_np,
    petwcls_np,
    pwcls_np,
    wcls_np,
)
from mrt_data_integration_spark.sources.generator import generate_panel_pdf
from mrt_data_integration_spark.stats import t_quantile

RESULT_SCHEMA = (
    "n_internal long, n_external long, replication long, method string, "
    "coef string, estimate double, se double, covered boolean, "
    "tilt_warning boolean"
)

METHODS = {
    "WCLS-Internal": lambda d: wcls_np(d, internal_only=True),
    "WCLS-Pooled": lambda d: wcls_np(d),
    "P-WCLS-Internal": lambda d: pwcls_np(d, internal_only=True),
    "P-WCLS-Pooled": lambda d: pwcls_np(d),
    "P-WCLS-Pooled-Obs": lambda d: pwcls_np(d, observational=True),
    "ET-WCLS-Equal": lambda d: etwcls_np(d, pooling="equal"),
    "ET-WCLS-Kron": lambda d: etwcls_np(d, pooling="kronecker"),
    "ET-WCLS": lambda d: etwcls_np(d, pooling="full"),
    "DR-WCLS": lambda d: drwcls_np(d),
    "PET-WCLS": lambda d: petwcls_np(d),
}

COEF_NAMES = ("Intercept", "Slope")


def simulate_one(
    seed: int,
    n_internal: int,
    n_external: int,
    beta_r_true: tuple[float, float] = (-2.0, 5.0),
    t_max: int = 20,
    dof: float = 10.0,
    methods: dict | None = None,
    x2_coef: float = -3.0,
    x21sq_coef: float = 0.0,
) -> pd.DataFrame:
    """One replication: generate a panel, fit every method, emit the
    long-format result rows (simulation.R:53-113)."""
    panel = generate_panel_pdf(
        seed=seed,
        user_start=1,
        n_users_chunk=n_internal + n_external,
        n_internal=n_internal,
        t_max=t_max,
        dof=dof,
        x2_coef=x2_coef,
        x21sq_coef=x21sq_coef,
    )
    rows = []
    truth = np.asarray(beta_r_true)
    for name, fn in (methods or METHODS).items():
        fit = fn(panel)
        # 95% CI with per-method dof = model$n − model$p: the row count
        # the fit used minus the full sandwich dimension
        # (simulation.R:38-39; wcls.R:189-190).
        q = t_quantile(0.975, fit.n - fit.p)
        for k, coef in enumerate(COEF_NAMES[: len(fit.beta_r)]):
            est, se = float(fit.beta_r[k]), float(fit.se_beta_r[k])
            covered = bool(
                (truth[k] >= est - q * se) and (truth[k] <= est + q * se)
            )
            rows.append(
                (
                    n_internal,
                    n_external,
                    seed,
                    name,
                    coef,
                    est,
                    se,
                    covered,
                    bool(fit.tilt_warning),
                )
            )
    return pd.DataFrame(
        rows,
        columns=[
            "n_internal",
            "n_external",
            "replication",
            "method",
            "coef",
            "estimate",
            "se",
            "covered",
            "tilt_warning",
        ],
    )


def run_grid(
    spark: SparkSession,
    size_pairs: list[tuple[int, int]],
    n_reps: int,
    beta_r_true: tuple[float, float] = (-2.0, 5.0),
    methods: dict | None = None,
    **gen_kwargs,
) -> DataFrame:
    """Fan the (size-pair × replication) grid out as Spark tasks —
    the distributed form of simulation.R:199-243."""
    configs = [
        (n_i, n_e, rep) for n_i, n_e in size_pairs for rep in range(1, n_reps + 1)
    ]
    grid = spark.createDataFrame(
        configs, "n_internal long, n_external long, replication long"
    ).repartition(min(len(configs), 512))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                yield simulate_one(
                    seed=int(row.replication),
                    n_internal=int(row.n_internal),
                    n_external=int(row.n_external),
                    beta_r_true=beta_r_true,
                    methods=methods,
                    **gen_kwargs,
                )

    return grid.mapInPandas(run, RESULT_SCHEMA)


def mc_summary(
    results: DataFrame,
    beta_r_true: tuple[float, float] = (-2.0, 5.0),
    reference_method: str = "WCLS-Internal",
) -> DataFrame:
    """Monte-Carlo summary aggregations (simulation.R:124-136, A9-A13):
    average estimate, empirical SE (population SD), average analytical
    SE, RMSE vs truth, coverage, tilt warnings, and relative efficiency
    vs the reference method (broadcast join, J4)."""
    truth = F.when(F.col("coef") == "Intercept", F.lit(beta_r_true[0])).otherwise(
        F.lit(beta_r_true[1])
    )
    per = (
        results.withColumn("truth", truth)
        .groupBy("n_internal", "n_external", "method", "coef")
        .agg(
            F.avg("estimate").alias("avg_estimate"),
            F.stddev_pop("estimate").alias("empirical_se"),
            F.avg("se").alias("analytical_se"),
            F.sqrt(F.avg(F.pow(F.col("estimate") - F.col("truth"), 2))).alias("rmse"),
            F.avg(F.col("covered").cast("double")).alias("coverage"),
            F.sum(F.col("tilt_warning").cast("long")).alias("tilt_warnings"),
        )
    )
    ref = per.filter(F.col("method") == reference_method).select(
        "n_internal",
        "n_external",
        "coef",
        F.col("empirical_se").alias("ref_emp_se"),
        F.col("analytical_se").alias("ref_an_se"),
    )
    return (
        per.join(F.broadcast(ref), ["n_internal", "n_external", "coef"])
        .withColumn("rel_efficiency", F.col("empirical_se") / F.col("ref_emp_se"))
        .withColumn("rel_efficiency_an", F.col("analytical_se") / F.col("ref_an_se"))
        .drop("ref_emp_se", "ref_an_se")
    )
