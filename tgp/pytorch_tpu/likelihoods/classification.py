"""Classification likelihoods: Bernoulli (Gauss-CDF link) and Categorical.

reference:
  * Bernoulli             — code/dsp/likelihoods/Bernoulli.py (quadrature of
    warped binary cross-entropy; predictive via GP-book eq. 3.77/3.80 when
    the flow is the identity, else quadrature with probability clamping)
  * MulticlassCategorical — code/dsp/likelihoods/MulticlassCategorical.py
    (reparameterized MC through flows into a softmax cross-entropy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.quadrature import GaussHermite
from .gaussian import LikelihoodSpec


def _norm_cdf(x):
    return jax.scipy.stats.norm.cdf(x)


def bernoulli_ell(spec: LikelihoodSpec, params, Y, mu, var, warp):
    """E_q(f0)[log p(y | Phi(G(f0)))] via quadrature.

    reference: code/dsp/likelihoods/Bernoulli.py:50-95.
    Args: Y (1, MB) in {0,1}; mu, var (1, MB); warp as in gaussian_flow_ell.
    Returns scalar (summed over the minibatch).
    """
    gh = GaussHermite(spec.quad_points)
    var = jnp.maximum(var, 0.0)  # reference clamps tiny negatives (Bernoulli.py:77)
    f = gh.shifted_locations(mu, var)           # (S, 1, MB)
    fk = warp(f)
    # exact log-CDF: log Phi(fk) via log_ndtr.  A clipped cdf is NOT safe in
    # fp32: clip(p, ., 1-1e-12) rounds to exactly 1.0, log1p(-p) = -inf and
    # the 0*(-inf) products NaN the gradient from step one (quadrature grids
    # reach |fk| ~ 13 immediately).  The reference leans on torch BCELoss's
    # internal log clamp instead (Bernoulli.py:36).
    log_p = jax.scipy.special.log_ndtr(fk)
    log_1mp = jax.scipy.special.log_ndtr(-fk)
    bce = Y[None] * log_p + (1.0 - Y[None]) * log_1mp
    ell = gh.reduce(bce)                        # (1, MB)
    return jnp.sum(ell)


def bernoulli_moments(spec: LikelihoodSpec, params, mu, var, warp,
                      identity_flow: bool):
    """p(y=1 | x) marginal.

    Identity flow: exact eq. 3.77/3.80 Phi(mu / sqrt(1 + var))
    (reference: Bernoulli.py:136-138); otherwise quadrature of Phi(G(f))
    with [0,1] clamping (Bernoulli.py:140-155).

    Deliberate deviation: the reference constructs the quadrature
    distribution with `gauss_cov.std()` (Bernoulli.py:120,141-142) — the
    SCALAR standard deviation of the covariance tensor across the batch,
    not the per-point sqrt — so its non-identity-flow predictive
    integrates under a Gaussian of a uniform wrong width.  We integrate
    with the correct per-point sqrt(var) (the same width its own training
    ELL uses, Bernoulli.py:79); tools/torch_replica_classification.py
    measures both variants against the full protocol.
    Returns (MB,) probabilities of class 1.
    """
    if identity_flow:
        p = _norm_cdf(mu / jnp.sqrt(1.0 + var))
        return p[0]
    gh = GaussHermite(spec.quad_points)
    f = gh.shifted_locations(mu, jnp.maximum(var, 0.0))
    p = gh.reduce(_norm_cdf(warp(f)))
    return jnp.clip(p, 0.0, 1.0)[0]


def categorical_ell(spec: LikelihoodSpec, params, Y, mu, var, warp, rng):
    """MC softmax cross-entropy through per-class flows.

    reference: code/dsp/likelihoods/MulticlassCategorical.py:51-105 — S
    reparameterized samples from q(f) (S = quad_points), warped per class,
    then mean-over-samples of the categorical log-likelihood.

    Args: Y (MB,) int labels; mu, var (C, MB); warp f (S, C, MB) -> same.
    Returns scalar (summed over minibatch, averaged over MC).
    """
    S = spec.quad_points
    C, MB = mu.shape
    eps = jax.random.normal(rng, (S, C, MB), mu.dtype)
    f0 = mu[None] + jnp.sqrt(var)[None] * eps
    fk = warp(f0)                                   # (S, C, MB)
    logits = jnp.moveaxis(fk, 1, -1)                # (S, MB, C)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, Y[None, :, None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(jnp.mean(ll, axis=0))


def categorical_moments(spec: LikelihoodSpec, params, mu, var, warp, rng):
    """Predictive class probabilities by sampled softmax mean.

    reference: MulticlassCategorical.py:109-151.  Returns (MB, C).
    """
    S = spec.quad_points
    C, MB = mu.shape
    eps = jax.random.normal(rng, (S, C, MB), mu.dtype)
    f0 = mu[None] + jnp.sqrt(var)[None] * eps
    fk = warp(f0)
    logits = jnp.moveaxis(fk, 1, -1)
    return jnp.mean(jax.nn.softmax(logits, axis=-1), axis=0)
