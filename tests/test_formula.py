"""Formula compiler tests: term expansion, I() arithmetic, treatment
factoring, and end-to-end parity — the paper's formulas through
``wcls_from_formulas`` reproduce the golden WCLS-Pooled numbers.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mrt_data_integration_spark.estimators.formula_api import wcls_from_formulas
from mrt_data_integration_spark.estimators.local import awcls_np
from mrt_data_integration_spark.formula import compile_formula, split_treatment

DAT = "/root/reference/example_dat.csv"


def test_compile_basic(spark):
    cf = compile_formula("y ~ x1 + x2 + x3")
    assert cf.response == "y"
    assert cf.intercept
    assert [n for n, _ in cf.terms] == ["x1", "x2", "x3"]
    assert len(cf.design()) == 4


def test_compile_no_intercept_I_terms(spark):
    cf = compile_formula("y ~ 0 + I(a_centered) + I(a_centered * x1)")
    assert not cf.intercept
    assert len(cf.terms) == 2


def test_star_interaction_expansion(spark):
    cf = compile_formula("y ~ a * b")
    names = [n for n, _ in cf.terms]
    assert names == ["a", "b", "a:b"]


def test_split_treatment(spark):
    mods = split_treatment("y ~ 0 + I(a_centered) + I(a_centered * x1)")
    assert [n for n, _ in mods] == ["1", "x1"]
    mods2 = split_treatment(
        "y ~ 0 + I(is_internal * a_centered) + I(is_internal * a_centered * x1)"
    )
    assert [n for n, _ in mods2] == ["is_internal", "is_internal*x1"]


def test_formula_eval_values(spark):
    df = spark.createDataFrame([(2.0, 3.0, 1)], "x1 double, x2 double, flag int")
    cf = compile_formula("~ I(x1^2) + I(as.numeric(flag) * x2) + I(x1 * x2 / 2)")
    row = df.select(*[c.alias(f"c{i}") for i, (_, c) in enumerate(cf.terms)]).collect()[0]
    assert row.c0 == 4.0 and row.c1 == 3.0 and row.c2 == 3.0


@pytest.mark.skipif(not os.path.exists(DAT), reason="golden data absent")
def test_formula_wcls_golden(spark):
    from tests.test_golden_wcls import _block_cluster, _load_panel

    panel = _block_cluster(_load_panel(spark)).cache()
    fit = wcls_from_formulas(
        panel,
        "y ~ x1 + x2 + x3",
        "y ~ 0 + I(a_centered) + I(a_centered * x1)",
        p_target=None,
        cluster_col="block_cluster",
        beta_r_true=np.array([-2.0, 5.0]),
    )
    np.testing.assert_allclose(fit.beta_r, (-0.738, 4.281), atol=6e-4)
    np.testing.assert_allclose(fit.se_beta_r, (0.751, 0.794), atol=6e-4)
    panel.unpersist()


@pytest.mark.skipif(not os.path.exists(DAT), reason="golden data absent")
def test_awcls_structure():
    df = pd.read_csv(DAT)
    df["is_internal"] = df["is_internal"].astype(bool)
    fit = awcls_np(df)
    assert fit.beta_r.shape == (4,)
    assert np.all(np.isfinite(fit.beta_r)) and np.all(fit.se_beta_r > 0)
    # pooled-ish point estimates should land near the other estimators
    assert -4 < fit.beta_r[0] < 0 and 3 < fit.beta_r[1] < 8