"""Warped-GP (Snelson et al.) likelihood: N(T(y) | f, sigma^2) |dT/dy|.

reference: code/dsp/likelihoods/WarpedGaussianLinearMean.py — the warp T acts
on the *observations* instead of the process; the ELL adds the log-Jacobian
of T, and predictive moments are quadrature integrals of T^{-1} under the
unwarped marginal.  (The reference's `log_marginal` carries a latent typo at
WarpedGaussianLinearMean.py:166 — `sel.` — fixed here.)

The warp derivative dT/dy comes from `jax.jvp` over the flow forward, which
replaces the reference's autograd `forward_grad` (code/dsp/models/flow.py:101-104).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quadrature import GaussHermite
from ..flows.core import flow_forward, flow_inverse
from .gaussian import (
    LikelihoodSpec,
    gaussian_ell,
    gaussian_log_marginal,
    gaussian_moments,
)


def _forward_and_grad(flow_spec, flow_params, Y):
    fwd = lambda y: flow_forward(flow_spec, flow_params, y)
    TY, dT = jax.jvp(fwd, (Y,), (jnp.ones_like(Y),))
    return TY, dT


def warped_ell(spec: LikelihoodSpec, params, Y, mu, var, flow_spec, flow_params):
    """E_q(f)[log p(T(y)|f)] + sum log |dT/dy|.
    reference: WarpedGaussianLinearMean.py:65-85.

    Shapes: Y/mu/var (Dy, MB); returns (Dy,).  The log-Jacobian is summed
    PER OUTPUT (axis=-1) — a scalar sum over the whole (Dy, MB) array would
    broadcast the full Jacobian onto every output row and the caller's
    jnp.sum would count it Dy times (latent at Dy=1, wrong for Dy>1)."""
    TY, dT = _forward_and_grad(flow_spec, flow_params, Y)
    base = gaussian_ell(spec, params, TY, mu, var)
    log_jac = jnp.sum(jnp.log(jnp.abs(dT) + 1e-30), axis=-1)
    return base + log_jac


def warped_unwarped_moments(spec: LikelihoodSpec, params, mu, var):
    """Moments of the unwarped observation process p(Y_0|f).
    reference: WarpedGaussianLinearMean.py:87-91."""
    return gaussian_moments(spec, params, mu, var)


def warped_moments(spec: LikelihoodSpec, params, mu, var, flow_spec, flow_params,
                   newton_iters: int = 100):
    """Predictive moments of Y = T^{-1}(f + eps) by quadrature of the inverse.
    reference: WarpedGaussianLinearMean.py:93-148."""
    gh = GaussHermite(spec.quad_points)
    m0, C0 = gaussian_moments(spec, params, mu, var)
    inv = lambda f: flow_inverse(flow_spec, flow_params, f, iters=newton_iters)
    m1 = gh.integrate(inv, m0, C0)
    e2 = gh.integrate(lambda f: jnp.square(inv(f)), m0, C0)
    return m1, e2 - jnp.square(m1)


def warped_log_marginal(spec: LikelihoodSpec, params, Y, mu, K, flow_spec, flow_params):
    """log p(Y|x) = log N(T(Y) | mu, K + sigma^2 I) + sum log|dT/dy|.
    reference: WarpedGaussianLinearMean.py:151-168."""
    TY, dT = _forward_and_grad(flow_spec, flow_params, Y)
    base = gaussian_log_marginal(spec, params, TY, mu, K)
    # per-output (Dy,) sum, matching gaussian_log_marginal (see warped_ell)
    return base + jnp.sum(jnp.log(jnp.abs(dT) + 1e-30), axis=-1)
