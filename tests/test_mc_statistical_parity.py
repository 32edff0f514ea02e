"""Statistical parity with the reference's committed Monte-Carlo study:
run the SAME cell it published — 400 replications at (400, 400), all 10
methods — through the distributed fan-out, and compare every summary
statistic to results/simulation_results.csv within Monte-Carlo error.

RNG streams differ from R's, so the comparison is distributional:
both runs estimate the same sampling moments with MC standard error
≈ SE/√400; tolerances are ~4σ of the difference of two independent
estimates. This is the reference's own acceptance criterion
(simulation.R:516-529) applied to OUR engine — 4,000 estimator fits in
one Spark job.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from mrt_data_integration_spark.simulation.harness import mc_summary, run_grid

REF_CSV = "/root/reference/results/simulation_results.csv"
N_REPS = 400

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CSV), reason="reference results not present"
)


@pytest.fixture(scope="module")
def our_summary(spark) -> pd.DataFrame:
    results = run_grid(spark, size_pairs=[(400, 400)], n_reps=N_REPS)
    return mc_summary(results).toPandas()


@pytest.fixture(scope="module")
def ref_summary() -> pd.DataFrame:
    ref = pd.read_csv(REF_CSV)
    ref = ref[(ref["Internal Sample Size"] == 400) & (ref["External Sample Size"] == 400)]
    return ref.set_index(["Method", "Coefficient Name"])


METHODS = [
    "WCLS-Internal",
    "WCLS-Pooled",
    "P-WCLS-Internal",
    "P-WCLS-Pooled",
    "P-WCLS-Pooled-Obs",
    "ET-WCLS-Equal",
    "ET-WCLS-Kron",
    "ET-WCLS",
    "DR-WCLS",
    "PET-WCLS",
]


@pytest.mark.parametrize("method", METHODS)
@pytest.mark.parametrize("coef", ["Intercept", "Slope"])
def test_mc_cell_matches_reference(our_summary, ref_summary, method, coef):
    ours = our_summary[(our_summary.method == method) & (our_summary.coef == coef)]
    assert len(ours) == 1, f"missing summary row for {method}/{coef}"
    ours = ours.iloc[0]
    ref = ref_summary.loc[(method, coef)]

    emp_se_ref = float(ref["Empirical Standard Error"])
    # average estimate: two independent MC means differ by ~√2·SE/√400.
    tol_mean = 4.0 * np.sqrt(2.0) * emp_se_ref / np.sqrt(N_REPS)
    assert abs(ours.avg_estimate - float(ref["Avg Estimate"])) < tol_mean, (
        f"{method}/{coef} avg: ours={ours.avg_estimate:.3f} "
        f"ref={ref['Avg Estimate']} tol={tol_mean:.3f}"
    )
    # empirical SE: ratio within the chi-distribution MC band (~4σ).
    ratio = ours.empirical_se / emp_se_ref
    tol_ratio = 4.0 * np.sqrt(2.0 / (2.0 * (N_REPS - 1)))
    assert abs(ratio - 1.0) < 2.5 * tol_ratio + 0.05, (
        f"{method}/{coef} empSE ratio {ratio:.3f}"
    )
    # coverage: binomial MC error.
    cov_ref = float(ref["Coverage (95% Nominal)"])
    tol_cov = 4.0 * np.sqrt(2.0 * cov_ref * max(1 - cov_ref, 0.01) / N_REPS)
    assert abs(ours.coverage - cov_ref) < tol_cov + 0.01, (
        f"{method}/{coef} coverage ours={ours.coverage:.3f} ref={cov_ref}"
    )


def test_relative_efficiency_ordering(our_summary):
    """The paper's headline finding must reproduce: PET-WCLS is more
    efficient than WCLS-Internal for both coefficients."""
    for coef in ["Intercept", "Slope"]:
        sub = our_summary[our_summary.coef == coef].set_index("method")
        assert sub.loc["PET-WCLS", "empirical_se"] < sub.loc["WCLS-Internal", "empirical_se"]