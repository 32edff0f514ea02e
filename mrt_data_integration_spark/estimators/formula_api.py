"""Formula-level estimator API — the reference's calling convention
(example-analysis.R:39-48) on top of the column-spec estimators:
R-style formula strings compile to design columns via
``mrt_data_integration_spark.formula``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

from mrt_data_integration_spark.estimators import (
    drwcls,
    etwcls,
    petwcls,
    pwcls,
    wcls,
)
from mrt_data_integration_spark.estimators.wcls import WclsFit
from mrt_data_integration_spark.formula import compile_formula, split_treatment


def wcls_from_formulas(
    df: DataFrame,
    beta_h_formula: str,
    beta_r_formula: str,
    beta_r_true: np.ndarray | None = None,
    **kwargs,
) -> WclsFit:
    """wcls(data, beta_h_formula, beta_r_formula, p_r_formula=a~1)."""
    cf = compile_formula(beta_h_formula)
    return wcls(
        df,
        x_h=cf.design(),
        moderators=split_treatment(beta_r_formula),
        y=cf.response or "y",
        beta_r_true=beta_r_true,
        **kwargs,
    )


def pwcls_from_formulas(
    df: DataFrame,
    beta_h_formula: str,
    beta_s_formula: str,
    r_formula: str,
    **kwargs,
) -> WclsFit:
    cf = compile_formula(beta_h_formula)
    r_cf = compile_formula(r_formula)
    return pwcls(
        df,
        x_h=cf.design(),
        s_moderators=split_treatment(beta_s_formula),
        r_moderators=r_cf.design(),
        y=cf.response or "y",
        **kwargs,
    )


def drwcls_from_formulas(
    df: DataFrame,
    beta_h_formula: str,
    beta_s_formula: str,
    r_formula: str,
    **kwargs,
) -> WclsFit:
    cf = compile_formula(beta_h_formula)
    r_cf = compile_formula(r_formula)
    return drwcls(
        df,
        x_h=cf.design(),
        s_moderators=split_treatment(beta_s_formula),
        r_moderators=r_cf.design(),
        y=cf.response or "y",
        **kwargs,
    )


def etwcls_from_formulas(
    df: DataFrame,
    et_beta_h_formula: str,
    et_beta_r_formula: str,
    **kwargs,
) -> WclsFit:
    cf = compile_formula(et_beta_h_formula)
    x_h = cf.terms if not cf.intercept else cf.design()
    return etwcls(
        df,
        x_h=x_h,
        moderators=split_treatment(et_beta_r_formula),
        y=cf.response or "y",
        **kwargs,
    )


def petwcls_from_formulas(
    df: DataFrame,
    beta_h_formula: str,
    beta_s_formula: str,
    et_beta_r_formula: str,
    pwcls_r_formula: str,
    **kwargs,
) -> WclsFit:
    cf = compile_formula(beta_h_formula)
    r_cf = compile_formula(pwcls_r_formula)
    return petwcls(
        df,
        x_h=cf.design(),
        s_moderators=split_treatment(beta_s_formula),
        et_moderators=split_treatment(et_beta_r_formula),
        r_moderators=r_cf.design(),
        y=cf.response or "y",
        **kwargs,
    )
