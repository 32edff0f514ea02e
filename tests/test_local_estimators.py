"""Golden parity of the task-local numpy estimator twins: every method
column of example_estimates.csv reproduced from example_dat.csv.

Cluster key mimics the reference's balanced-path block clustering (see
test_golden_wcls.py) by overwriting user_id with row-block ids.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from mrt_data_integration_spark.estimators.local import (
    drwcls_np,
    etwcls_np,
    petwcls_np,
    pwcls_np,
    wcls_np,
)

DAT = "/root/reference/example_dat.csv"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DAT), reason="reference golden data not present"
)

GOLDEN = {
    "WCLS-Internal": ((-1.876, 6.355), (1.259, 1.379)),
    "WCLS-Pooled": ((-0.738, 4.281), (0.751, 0.794)),
    "P-WCLS-Internal": ((-1.814, 6.321), (1.276, 1.385)),
    "P-WCLS-Pooled": ((-2.363, 6.07), (0.98, 0.994)),
    "P-WCLS-Pooled-Obs": ((-2.441, 6.272), (0.988, 1.037)),
    "ET-WCLS-Equal": ((-1.802, 5.688), (1.514, 1.682)),
    "ET-WCLS-Kron": ((-1.826, 5.924), (1.238, 1.365)),
    "ET-WCLS": ((-2.003, 6.028), (1.11, 1.22)),
    "DR-WCLS": ((-2.164, 5.944), (1.157, 1.286)),
    "PET-WCLS": ((-2.561, 5.817), (0.964, 0.959)),
}

FITTERS = {
    "WCLS-Internal": lambda d: wcls_np(d, internal_only=True),
    "WCLS-Pooled": wcls_np,
    "P-WCLS-Internal": lambda d: pwcls_np(d, internal_only=True),
    "P-WCLS-Pooled": pwcls_np,
    "P-WCLS-Pooled-Obs": lambda d: pwcls_np(d, observational=True),
    "ET-WCLS-Equal": lambda d: etwcls_np(d, pooling="equal"),
    "ET-WCLS-Kron": lambda d: etwcls_np(d, pooling="kronecker"),
    "ET-WCLS": etwcls_np,
    "DR-WCLS": drwcls_np,
    "PET-WCLS": petwcls_np,
}


@pytest.fixture(scope="module")
def golden_panel() -> pd.DataFrame:
    df = pd.read_csv(DAT)
    df["is_internal"] = df["is_internal"].astype(bool)
    # Reference balanced-path quirk: cluster = consecutive 20-row blocks
    # in file order (extras/helpers.R:7-15 over time-major data).
    df["user_id"] = np.arange(len(df)) // 20
    return df


@pytest.mark.parametrize("method", sorted(GOLDEN.keys()))
def test_local_golden(golden_panel, method):
    fit = FITTERS[method](golden_panel)
    beta, se = GOLDEN[method]
    np.testing.assert_allclose(fit.beta_r, beta, atol=6e-4)
    np.testing.assert_allclose(fit.se_beta_r, se, atol=6e-4)
