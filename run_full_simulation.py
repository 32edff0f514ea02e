"""Reproduce the reference's ENTIRE Monte-Carlo study as one Spark job:
13 sample-size pairs × 400 replications × 10 methods = 52,000 estimator
fits (simulation.R:199-243 — a checkpointed multi-hour serial R loop),
then the full summary table (the engine's analogue of
results/simulation_results.csv).

Usage: python run_full_simulation.py [out_dir]
Prints one JSON line with wall-clock and fit throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mrt_data_integration_spark.session import get_spark  # noqa: E402
from mrt_data_integration_spark.simulation.harness import (  # noqa: E402
    mc_summary,
    run_grid,
)

# simulation.R:204-210: the paper's exact 13 pairs — 5 diagonal,
# 100-vs-external crosses, and internal-vs-100 crosses.
SIZE_PAIRS = [
    (25, 25), (100, 100), (400, 400), (1600, 1600), (6400, 6400),
    (100, 25), (100, 400), (100, 1600), (100, 6400),
    (25, 100), (400, 100), (1600, 100), (6400, 100),
]
N_REPS = 400


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mrt_full_simulation"
    spark = get_spark("mrt-full-simulation")
    t0 = time.perf_counter()
    # Materialize the per-replication results ONCE; the summary and the
    # boxplot figure both derive from the read-back (filtering the lazy
    # mapInPandas frame would re-run the whole grid per consumer).
    run_grid(spark, size_pairs=SIZE_PAIRS, n_reps=N_REPS).write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "results.parquet"))
    results = spark.read.parquet(os.path.join(out_dir, "results.parquet"))
    summary = mc_summary(results)
    summary.write.mode("overwrite").parquet(os.path.join(out_dir, "summary.parquet"))
    elapsed = time.perf_counter() - t0
    n_fits = len(SIZE_PAIRS) * N_REPS * 10
    pdf = (
        spark.read.parquet(os.path.join(out_dir, "summary.parquet"))
        .orderBy("n_internal", "n_external", "method", "coef")
        .toPandas()
    )
    pdf.to_csv(os.path.join(out_dir, "simulation_results.csv"), index=False)

    # S5 figure sink (simulation.R:310-436): the two reference figures as
    # Vega-Lite JSON artifacts next to the CSV.
    from pyspark.sql import functions as F

    from mrt_data_integration_spark.report import (
        error_boxplot_spec,
        se_lineplot_spec,
        write_figure,
    )

    for side in ("internal", "external"):
        write_figure(
            se_lineplot_spec(pdf, fixed_side=side),
            os.path.join(out_dir, f"sample_size_se_{side}100.vl.json"),
        )
    est_400 = (
        results.filter((F.col("n_internal") == 400) & (F.col("n_external") == 400))
        .select("method", "coef", "estimate")
        .toPandas()
    )
    write_figure(
        error_boxplot_spec(est_400, {"Intercept": -2.0, "Slope": 5.0}),
        os.path.join(out_dir, "estimates_400_400.vl.json"),
    )
    print(
        json.dumps(
            {
                "metric": "full_mc_study_sec",
                "value": round(elapsed, 1),
                "unit": "sec",
                "fits": n_fits,
                "fits_per_sec": round(n_fits / elapsed, 1),
                "rows": len(pdf),
                "out": out_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
