"""Gaussian likelihoods (linear and flow-warped means).

reference:
  * GaussianLinearMean     — code/dsp/likelihoods/GaussianLinearMean.py
  * GaussianNonLinearMean  — code/dsp/likelihoods/GaussianNonLinearMean.py

Functional API: parameters are {'log_var_noise': (Dy or 1, 1)} with the
'exp' positive transform (reference: code/dsp/config.py:61); expectations
through flows use baked Gauss-Hermite constants; the per-output flow loop of
the reference becomes a `warp` callable supplied by the model (already
vmapped over Dy).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..ops.quadrature import GaussHermite
from ..ops.linalg import safe_cholesky, cholesky_solve


@dataclasses.dataclass(frozen=True)
class LikelihoodSpec:
    """Static likelihood description.

    kind: 'gaussian' | 'gaussian_flow' | 'bernoulli' | 'categorical' | 'warped'
    warp_flow: for kind='warped', the observation-warp T's flow spec (the
    warp lives in the likelihood, applied to Y — reference:
    code/dsp/likelihoods/WarpedGaussianLinearMean.py:26-42).
    """

    kind: str
    out_dim: int
    noise_is_shared: bool = False
    quad_points: int = 100
    num_classes: int = 0        # categorical only
    warp_flow: tuple = ()       # warped only


def init_likelihood_params(spec: LikelihoodSpec, noise_init: float = 0.05,
                           dtype=None, warp_inits=None):
    """reference: GaussianLinearMean.__init__ (GaussianLinearMean.py:29-41) —
    a (Dy,1) (or shared (1,1)) log-variance parameter."""
    dtype = dtype or cfg.default_dtype()
    if spec.kind in ("bernoulli", "categorical"):
        return {}
    n = 1 if spec.noise_is_shared else spec.out_dim
    params = {"log_var_noise": jnp.full((n, 1), float(np.log(noise_init)), dtype)}
    if spec.kind == "warped" and spec.warp_flow:
        from ..flows.core import init_flow_params
        params["warp"] = init_flow_params(spec.warp_flow, inits=warp_inits,
                                          dtype=dtype)
    return params


def noise_variance(spec: LikelihoodSpec, params, Dy: int | None = None):
    """(Dy, 1) positive noise variance (expanded if shared)."""
    Dy = Dy or spec.out_dim
    v = jnp.exp(params["log_var_noise"])
    return jnp.broadcast_to(v, (Dy, 1))


def _log_normal(y, mean, var):
    return -0.5 * (jnp.log(2.0 * math.pi * var) + jnp.square(y - mean) / var)


# ---------------------------------------------------------------------------
# Linear-mean Gaussian
# ---------------------------------------------------------------------------

def gaussian_ell(spec: LikelihoodSpec, params, Y, mu, var):
    """Closed-form expected log-likelihood.

    E_q(f)[log p(y|f)] = log N(y | mu, C_y) - 0.5 tr(C_y^{-1} C_f)
    reference: code/dsp/likelihoods/GaussianLinearMean.py:60-87.

    Args: Y, mu, var all (Dy, MB).  Returns (Dy,).
    """
    C_y = noise_variance(spec, params)  # (Dy,1)
    log_p = jnp.sum(_log_normal(Y, mu, C_y), axis=-1)
    trace = -0.5 * jnp.sum(var / C_y, axis=-1)
    return log_p + trace


def gaussian_moments(spec: LikelihoodSpec, params, mu, var):
    """Predictive moments: (m1, m2) = (mu, var + sigma^2).
    reference: GaussianLinearMean.py:89-118."""
    C_y = noise_variance(spec, params)
    return mu, var + C_y


def gaussian_log_marginal(spec: LikelihoodSpec, params, Y, mu, K):
    """Exact log marginal likelihood log N(Y | mu, K + sigma^2 I).

    reference: GaussianLinearMean.py:121-155.  Y, mu: (Dy, N); K: (Dy, N, N).
    """
    Dy, N = Y.shape
    C_y = noise_variance(spec, params)  # (Dy,1)
    Kn = K + C_y[..., None] * jnp.eye(N, dtype=K.dtype)
    L, _ = safe_cholesky(Kn)
    diff = (Y - mu)[..., None]
    sol = cholesky_solve(L, diff)
    data_fit = jnp.sum(diff * sol, axis=(-2, -1))
    complexity = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
    cte = N * math.log(2.0 * math.pi)
    return -0.5 * (data_fit + complexity + cte)


# ---------------------------------------------------------------------------
# Flow-warped Gaussian (quadrature / LOTUS)
# ---------------------------------------------------------------------------

def gaussian_flow_ell(spec: LikelihoodSpec, params, Y, mu, var, warp):
    """Quadrature expected log-likelihood through a flow.

    E_q(f0)[log p(y | G(f0))] ~= 1/sqrt(pi) sum_i w_i log N(y | G(sqrt(2)s x_i + mu), C_y)
    reference: code/dsp/likelihoods/GaussianNonLinearMean.py:64-150.

    Args:
      Y, mu, var: (Dy, MB).
      warp: callable f (S, Dy, MB) -> warped (S, Dy, MB) (vmapped over Dy by
            the model; receives the GH-shifted samples).
    Returns (Dy,).
    """
    gh = GaussHermite(spec.quad_points)
    C_y = noise_variance(spec, params)[..., None]        # (Dy,1,1)
    f = gh.shifted_locations(mu, var)                    # (S, Dy, MB)
    fk = warp(f)
    log_p = _log_normal(Y[None], fk, C_y.reshape(1, -1, 1))
    ell = gh.reduce(log_p)                               # (Dy, MB)
    return jnp.sum(ell, axis=-1)


def gaussian_flow_moments(spec: LikelihoodSpec, params, mu, var, warp):
    """Predictive moments by quadrature through the flow.

    m1 = E_quad[G(f)];  m2 = sigma^2 + E_quad[G(f)^2] - m1^2
    reference: GaussianNonLinearMean.py:152-203.
    """
    gh = GaussHermite(spec.quad_points)
    C_y = noise_variance(spec, params)
    f = gh.shifted_locations(mu, var)
    fk = warp(f)
    m1 = gh.reduce(fk)
    e2 = gh.reduce(jnp.square(fk))
    m2 = C_y + e2 - jnp.square(m1)
    return m1, m2
