"""Batched dense linear algebra for sparse variational GPs.

Replaces the reference's torch/gpytorch numerics surface:
  * jittered Cholesky (reference: code/dsp/utils.py:222-270) — under jit we
    add a fixed dtype-scaled jitter up-front instead of the data-dependent
    retry ladder (which cannot trace); callers can pass an explicit jitter,
  * batched diagonal log-Gaussian density (reference: code/dsp/utils.py:164-195),
  * whitened / full-Gaussian KL divergences
    (reference: code/dsp/models/sparse_MF_SP.py:398-455).

All functions operate on arbitrary leading batch dimensions and keep the
reductions in the statistics dtype (float32 minimum).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .. import config as cfg


def add_jitter(A, jitter: float | None = None):
    """A + jitter * I on the trailing two dims.

    Default jitter policy: fp64 uses the reference's absolute 1e-8 base
    (code/dsp/utils.py:256-257); fp32 uses a *scale-aware* jitter
    1e-5 * mean(diag A) (floored at 1e-6) — fp32 rounding of a smooth-kernel
    Gram routinely produces eigenvalues around -5e-6 * scale, which the
    reference's escalating ladder (up to 1e-4 * 10^i) would also have
    absorbed; a fixed absolute 1e-6 does not.
    """
    M = A.shape[-1]
    if jitter is None:
        base = cfg.jitter_value(A.dtype)
        if jnp.dtype(A.dtype) == jnp.float32:
            mean_diag = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1),
                                 axis=-1, keepdims=True)
            j = jnp.maximum(10.0 * base * mean_diag, base)[..., None]
            return A + j * jnp.eye(M, dtype=A.dtype)
        jitter = base
    return A + jitter * jnp.eye(M, dtype=A.dtype)


def safe_cholesky(A, jitter: float | None = None):
    """Lower Cholesky with an escalating jitter ladder, jit-compatible.

    The reference retries the factorization with jitter * 10^i, i < 3, on
    failure (code/dsp/utils.py:222-270).  A data-dependent python retry does
    not trace; instead the ladder is evaluated as a small batch of chol
    calls (base, 10x, 100x — O(3 M^3), negligible next to the O(N M^2)
    solves) and the first finite factorization is selected per batch
    element.  fp32 runs genuinely need this: Gram matrices of drifting
    kernel hyper-parameters can go indefinite past any fixed jitter.

    Returns (L, A_jittered) like the reference's variant that also returns
    the stabilised matrix.
    """
    if jitter is not None:
        Aj = add_jitter(A, jitter)
        return jnp.linalg.cholesky(Aj), Aj

    # --- probe phase (no gradients): find the smallest ladder level whose
    # factorization is finite.  stop_gradient keeps any NaN produced by the
    # failing probes out of the autodiff graph entirely.
    base = cfg.jitter_value(A.dtype)
    M = A.shape[-1]
    eye = jnp.eye(M, dtype=A.dtype)
    mean_diag = jnp.mean(jnp.diagonal(A, axis1=-2, axis2=-1),
                         axis=-1)[..., None, None]
    if jnp.dtype(A.dtype) == jnp.float32:
        j0 = jnp.maximum(10.0 * base * mean_diag, base)  # scale-aware fp32 base
    else:
        j0 = jnp.full_like(mean_diag, base)              # reference's absolute base

    A_sg = jax.lax.stop_gradient(A)
    j0_sg = jax.lax.stop_gradient(j0)
    ok1 = jnp.isfinite(jnp.linalg.cholesky(A_sg + j0_sg * eye)).all(
        axis=(-2, -1), keepdims=True)
    ok2 = jnp.isfinite(jnp.linalg.cholesky(A_sg + 10.0 * j0_sg * eye)).all(
        axis=(-2, -1), keepdims=True)
    jit_sel = jnp.where(ok1, j0, jnp.where(ok2, 10.0 * j0, 100.0 * j0))

    # --- differentiable phase: one chol at the selected jitter (finite by
    # construction unless even 100x fails, which the reference also raises on)
    Aj = A + jax.lax.stop_gradient(jit_sel) * eye
    L = jnp.linalg.cholesky(Aj)
    return L, Aj


def tril_solve(L, B):
    """Solve L X = B with L lower-triangular (batched)."""
    return jsl.solve_triangular(L, B, lower=True)


def triu_solve(U, B):
    """Solve U X = B with U upper-triangular (batched)."""
    return jsl.solve_triangular(U, B, lower=False)


def cholesky_solve(L, B):
    """Solve A X = B given A = L L^T (batched)."""
    return jsl.cho_solve((L, True), B)


def batched_log_gaussian(obs, mean, cov, cov_is_inverse: bool = False):
    """log N(obs | mean, diag(cov)) reduced over the trailing dim.

    reference: code/dsp/utils.py:164-195 (`batched_log_Gaussian`,
    diagonal-only — the full-covariance branch raises there too).

    Args:
      obs, mean, cov: (*, N) tensors.
      cov_is_inverse: if True, `cov` already holds the precision.
    Returns: (*,) log-densities.
    """
    N = mean.shape[-1]
    cte = N * math.log(2.0 * math.pi)
    log_det = jnp.sum(jnp.log(cov), axis=-1)
    inv_c = cov if cov_is_inverse else 1.0 / cov
    if cov_is_inverse:
        log_det = -log_det
    diff = obs - mean
    maha = jnp.sum(diff * inv_c * diff, axis=-1)
    return -0.5 * (cte + log_det + maha)


def tril_mask(L):
    """Zero the strictly-upper triangle (the reference stores q(U)'s scale as
    a dense matrix and masks it, code/dsp/models/sparse_MF_SP.py:344-347)."""
    return jnp.tril(L)


def kl_whitened(m, L_raw):
    """KL( N(m, S) || N(0, I) ) with S = tril(L_raw) tril(L_raw)^T.

    Closed form used by the whitened inducing parameterisation
    (reference: code/dsp/models/sparse_MF_SP.py:406-431, following
    arXiv 2003.01115):
        0.5 * ( -log|S| + m^T m + tr(S) - M )

    Args:
      m:     (..., M) variational mean.
      L_raw: (..., M, M) unmasked scale; the lower triangle is used.
    Returns: (...,) KL per batch element.
    """
    L = tril_mask(L_raw)
    M = m.shape[-1]
    # tiny floor inside the log: the raw scale's diagonal is unconstrained
    # (the reference also stores a raw masked matrix,
    # sparse_MF_SP.py:344-347) and a zero crossing would make the logdet
    # -inf and its gradient 1/0 — poisoning fp32 runs that graze zero.
    eps = 1e-30 if L.dtype == jnp.float64 else 1e-12
    log_det = jnp.sum(jnp.log(jnp.square(jnp.diagonal(L, axis1=-2, axis2=-1)) + eps), axis=-1)
    dot_mean = jnp.sum(jnp.square(m), axis=-1)
    trace = jnp.sum(jnp.square(L), axis=(-2, -1))  # tr(L L^T) = ||L||_F^2
    return 0.5 * (-log_det + dot_mean + trace - float(M))


def kl_gaussian(m_q, L_q_raw, m_p, K_p, jitter: float | None = None):
    """KL( N(m_q, S_q) || N(m_p, K_p) ) with S_q = tril(L_q) tril(L_q)^T.

    The unwhitened branch of the reference delegates to
    torch.distributions.kl_divergence (code/dsp/models/sparse_MF_SP.py:433-453);
    we use the closed form with a jittered Cholesky of K_p:
        0.5*( log|K_p| - log|S_q| - M + tr(K_p^{-1} S_q)
              + (m_p - m_q)^T K_p^{-1} (m_p - m_q) )
    """
    Lq = tril_mask(L_q_raw)
    M = m_q.shape[-1]
    Lp, _ = safe_cholesky(K_p, jitter)

    log_det_p = 2.0 * jnp.sum(jnp.log(jnp.diagonal(Lp, axis1=-2, axis2=-1)), axis=-1)
    log_det_q = jnp.sum(jnp.log(jnp.square(jnp.diagonal(Lq, axis1=-2, axis2=-1))), axis=-1)

    # tr(K_p^{-1} S_q) = || Lp^{-1} Lq ||_F^2
    A = tril_solve(Lp, Lq)
    trace = jnp.sum(jnp.square(A), axis=(-2, -1))

    diff = (m_p - m_q)[..., None]
    sol = tril_solve(Lp, diff)
    maha = jnp.sum(jnp.square(sol), axis=(-2, -1))

    return 0.5 * (log_det_p - log_det_q - float(M) + trace + maha)
