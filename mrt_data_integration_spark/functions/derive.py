"""Row-parallel derived-column functions — the ETL core (SURVEY.md §2.2).

Each function returns a ``pyspark.sql.Column`` built from JVM-side
expressions only (no Python UDFs), so every derivation chain stays inside
whole-stage codegen and costs one fused pass over the data regardless of
how many columns are stacked.

Reference parity (semantics, not code): methods/wcls.R:125-150,
methods/drwcls.R:161-176, generate_data.R:47-51 of
eastonhuch/mrt-data-integration.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def logistic(z: Column | str) -> Column:
    """Logistic link p = 1/(1+exp(-z)).

    Parity: the inline ``1/(1+exp(-x))`` at generate_data.R:47-48 and each
    method's propensity prediction (e.g. methods/pwcls.R:59).
    """
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-_c(z)))


def centered_treatment(a: Column | str, p_hat: Column | str) -> Column:
    """a_centered = a - p_hat (methods/wcls.R:129)."""
    return _c(a) - _c(p_hat)


def observed_arm_prob(a: Column | str, p: Column | str) -> Column:
    """p_a = a*p + (1-a)*(1-p) — probability of the observed arm
    (generate_data.R:51, methods/wcls.R:130)."""
    a_, p_ = _c(a), _c(p)
    return a_ * p_ + (F.lit(1.0) - a_) * (F.lit(1.0) - p_)


def ipw_weight(
    p_target_a: Column | str,
    p_behavior_a: Column | str,
    override: Column | str | None = None,
) -> Column:
    """Inverse-probability weight w = p_target_a / p_behavior_a, with an
    optional user-supplied override column (methods/wcls.R:131-135)."""
    w = _c(p_target_a) / _c(p_behavior_a)
    if override is not None:
        w = F.coalesce(_c(override), w)
    return w


def tilt_ratio(
    is_internal: Column | str,
    linear_predictor: Column | str,
    log_odds_offset: Column | str | None = None,
) -> Column:
    """Exponential-tilting ratio (methods/wcls.R:142-149).

    raw = exp(linear_predictor - offset); internal rows get ratio 1,
    external rows get raw. The offset is the sampling log-odds
    ``log(pi/(1-pi))`` subtracted from the tilt intercept.
    """
    lp = _c(linear_predictor)
    if log_odds_offset is not None:
        lp = lp - _c(log_odds_offset)
    raw = F.exp(lp)
    flag = _c(is_internal).cast("boolean")
    return F.when(flag, F.lit(1.0)).otherwise(raw)


def combined_weight(w: Column | str, tilt: Column | str) -> Column:
    """w_and_tilt = w * tilt_ratios (methods/wcls.R:150)."""
    return _c(w) * _c(tilt)


def linear_predictor(coefs: Iterable[float], cols: Iterable[Column | str]) -> Column:
    """Dot product of literal coefficients with columns — the engine's
    ``predict(mod, newdata)`` (methods/wcls.R:125): a codegen'd expression,
    no model object needed executor-side."""
    terms = [F.lit(float(b)) * _c(c) for b, c in zip(coefs, cols, strict=True)]
    if not terms:
        return F.lit(0.0)
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def ci_covered(
    truth: Column | str, est: Column | str, se: Column | str, t_quantile: float
) -> Column:
    """Per-row CI coverage flag (simulation.R:40-42)."""
    tr, e, s = _c(truth), _c(est), _c(se)
    q = F.lit(float(t_quantile))
    return (tr >= e - q * s) & (tr <= e + q * s)
