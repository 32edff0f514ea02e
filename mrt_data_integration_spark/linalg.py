"""Driver-side small-matrix algebra (SURVEY.md §2.6 L1-L6).

Everything here operates on d×d matrices with d <= ~34, collected from
distributed aggregations — numpy is the right tool; nothing in this
module ever sees row-level data.
"""

from __future__ import annotations

import numpy as np


def final_sandwich_step(
    hessian: np.ndarray, meat: np.ndarray, n_users: int, d: int
) -> np.ndarray:
    """Sandwich variance A⁻¹ B A⁻ᵀ with small-sample factor n/(n−d).

    Parity: extras/helpers.R:1-5 — ``solve(hessian, t(chol(meat)))``
    then tcrossprod. The meat Cholesky keeps the product symmetric PSD
    even when the hessian is asymmetric (it is: the M-estimation
    cross-blocks fill only one triangle).
    """
    # R's chol() is upper-triangular U with UᵀU = meat; t(chol) = lower L.
    # numpy cholesky returns L directly with L Lᵀ = meat.
    jitter = 0.0
    for _ in range(3):
        try:
            half = np.linalg.cholesky(meat + jitter * np.eye(meat.shape[0]))
            break
        except np.linalg.LinAlgError:
            jitter = max(jitter * 10, 1e-12 * max(np.trace(meat), 1.0))
    else:  # pragma: no cover - pathological
        half = np.linalg.cholesky(meat + 1e-8 * np.eye(meat.shape[0]))
    half_sandwich = np.linalg.solve(hessian, half)
    return half_sandwich @ half_sandwich.T * n_users / (n_users - d)


def solve_wls(gram: np.ndarray, xty: np.ndarray) -> np.ndarray:
    """β = (XᵀWX)⁻¹ XᵀWy with lstsq fallback for near-singular systems
    (the reference pushes through with tol=1e-30 overrides; we fall back
    to the minimum-norm solution)."""
    try:
        return np.linalg.solve(gram, xty)
    except np.linalg.LinAlgError:
        return np.linalg.lstsq(gram, xty, rcond=None)[0]


def se_from_var(var: np.ndarray) -> np.ndarray:
    """se = sqrt(diag(V)) (wcls.R:177)."""
    return np.sqrt(np.clip(np.diag(var), 0.0, None))


def chi2_stat(error: np.ndarray, var: np.ndarray) -> float:
    """χ² = eᵀ V⁻¹ e (wcls.R:180)."""
    try:
        return float(error @ np.linalg.solve(var, error))
    except np.linalg.LinAlgError:
        return float(error @ np.linalg.lstsq(var, error, rcond=None)[0])


def pool_full(
    beta_stacked: np.ndarray, var: np.ndarray, n_blocks: int
) -> tuple[np.ndarray, np.ndarray]:
    """Precision-weighted pooling of ``n_blocks`` stacked d_r-estimates
    with a JOINT covariance (etwcls.R:183-195 'full' mode; drwcls.R:
    250-262 with 2 blocks; petwcls.R:234-246 with 3):

      Λ = V⁻¹;  Λ_sum = Σ_jk Λ[j,k];  β = Λ_sum⁻¹ Σ_j (Λβ)_j;
      V_pooled = Λ_sum⁻¹ (Σ_j Λ[j,:]) V (Σ_j Λ[j,:])ᵀ Λ_sum⁻¹.
    """
    m = n_blocks
    d_r = beta_stacked.size // m
    try:
        lam = np.linalg.inv(var)
    except np.linalg.LinAlgError:
        # near-singular joint covariance (the reference pushes through
        # with tol=1e-50 solves; we take the pseudo-inverse).
        lam = np.linalg.pinv(var)
    lam_sum = np.zeros((d_r, d_r))
    for j in range(m):
        for k in range(m):
            lam_sum += lam[j * d_r : (j + 1) * d_r, k * d_r : (k + 1) * d_r]
    try:
        lam_sum_inv = np.linalg.inv(lam_sum)
    except np.linalg.LinAlgError:
        lam_sum_inv = np.linalg.pinv(lam_sum)
    z = lam @ beta_stacked
    z_sum = sum(z[j * d_r : (j + 1) * d_r] for j in range(m))
    beta_pooled = lam_sum_inv @ z_sum
    lam_horiz = sum(lam[j * d_r : (j + 1) * d_r, :] for j in range(m))
    var_pooled = lam_sum_inv @ lam_horiz @ var @ lam_horiz.T @ lam_sum_inv
    return beta_pooled, var_pooled


def pool_two_block_weights(
    beta_stacked: np.ndarray, var: np.ndarray, lam_tilde: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """The reference's 'kronecker'/'equal' pooling of two d_r=2 blocks
    (etwcls.R:171-182,196-203): scalar weights w_j = column sums of a
    2×2 reduced precision Λ̃, applied via a Kronecker-structured map."""
    d_r = 2
    w1 = float(lam_tilde[:, 0].sum())
    w2 = float(lam_tilde[:, 1].sum())
    w_sum = w1 + w2
    beta_pooled = (w1 * beta_stacked[:d_r] + w2 * beta_stacked[d_r:]) / w_sum
    kron_mat = np.kron(lam_tilde[0, :][None, :], np.eye(2)) + np.kron(
        lam_tilde[1, :][None, :], np.eye(2)
    )
    var_pooled = kron_mat @ var @ kron_mat.T / w_sum**2
    return beta_pooled, var_pooled


def inverse_variance_pool(
    estimates: list[np.ndarray], variances: list[np.ndarray]
) -> tuple[np.ndarray, np.ndarray]:
    """Precision-weighted pooling of independent estimates
    (etwcls.R:171-206 'full' mode): β = (ΣΛᵢ)⁻¹ ΣΛᵢβᵢ, V = (ΣΛᵢ)⁻¹."""
    precisions = [np.linalg.pinv(v) for v in variances]
    total_precision = np.sum(precisions, axis=0)
    pooled_var = np.linalg.pinv(total_precision)
    weighted = np.sum([p @ b for p, b in zip(precisions, estimates)], axis=0)
    return pooled_var @ weighted, pooled_var
