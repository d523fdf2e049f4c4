"""Model utilities: confidence intervals, prior sampling, inducing
propagation for deep stacks.

reference: code/dsp/models/utils_models.py:33-140 (confidence intervals by
sampling quantiles, with a closed-form path for the warped-likelihood
model), :323-352 (`propagate_inducing` for DGP initialisation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kernels as kernels_mod
from ..ops.linalg import safe_cholesky
from .means import mean_apply, projection_matrix
from . import tgp as tgp_mod
from .tgp import TGPSpec, _expand_tree, _ensure_3d


def confidence_intervals(spec: TGPSpec, params, X, intervals, S: int, rng,
                         distribution: str = "predictive",
                         fully_bayesian: bool = False):
    """Pointwise quantile confidence intervals.

    reference: code/dsp/models/utils_models.py:33-121.  The warped
    likelihood gets the closed path (median/bands by warping the Gaussian
    bands through T^{-1}, utils_models.py:48-87); everything else draws S
    samples and takes per-point quantiles.

    Returns: list over outputs of a list over `intervals` of (MB,) arrays.
    """
    lik = spec.likelihood
    if lik.kind == "warped" and distribution == "predictive":
        from ..flows.core import flow_inverse
        from ..likelihoods.warped import warped_unwarped_moments
        if list(intervals) != [0.025, 0.5, 0.975]:
            raise NotImplementedError("warped closed path supports 95% + median")
        mu, var = tgp_mod.marginal_qf(spec, params, X, diagonal=True)
        m0, C0 = warped_unwarped_moments(lik, params["likelihood"], mu, var)
        inv = lambda f: flow_inverse(lik.warp_flow, params["likelihood"]["warp"], f)
        lo = inv(m0 - 1.96 * jnp.sqrt(C0))
        med = inv(m0)
        hi = inv(m0 + 1.96 * jnp.sqrt(C0))
        return [[np.asarray(lo[d]), np.asarray(med[d]), np.asarray(hi[d])]
                for d in range(spec.Dy)]

    if distribution == "predictive":
        samples, _, _ = tgp_mod.sample_predictive(spec, params, X, S, rng,
                                                  fully_bayesian)
        samples = jnp.swapaxes(samples, 0, 1)     # (S, Dy, MB)
    elif distribution == "posterior":
        samples, _, _, _ = tgp_mod.sample_marginal(spec, params, X, S, rng,
                                                   fully_bayesian)
    else:
        raise ValueError(distribution)
    s_np = np.asarray(samples)
    out = []
    for d in range(spec.Dy):
        out.append([np.quantile(s_np[:, d, :], q, axis=0) for q in intervals])
    return out


def compute_95_and_median_confidence_intervals(spec, params, X, S, rng,
                                               distribution="predictive",
                                               fully_bayesian=False):
    """reference: utils_models.py:123-140."""
    return confidence_intervals(spec, params, X, [0.025, 0.5, 0.975], S, rng,
                                distribution, fully_bayesian)


def sample_prior(spec: TGPSpec, params, X, S: int, rng):
    """S samples from the GP prior p(f) at X: (S, Dy, MB).

    Used by sampling-based inducing propagation (utils_models.py:333-335).
    """
    X3 = _ensure_3d(spec, X)
    kp = _expand_tree(params["kernel"], spec.Dy) if spec.K_is_shared else params["kernel"]
    mp = _expand_tree(params["mean"], spec.Dy) if spec.mean_is_shared else params["mean"]
    Kxx = kernels_mod.gram(spec.kernel, kp, X3, X3, same=True)
    mu = mean_apply(spec.mean, mp, X3)
    L, _ = safe_cholesky(Kxx)
    eps = jax.random.normal(rng, (S,) + mu.shape, mu.dtype)
    return mu[None] + jnp.einsum("dnm,sdm->sdn", L, eps)


def propagate_inducing(spec: TGPSpec, params, Z, out_dim: int, rng=None,
                       how: str = "salimbeni", W=None):
    """Propagate inducing locations through a layer for deep stacks.

    reference: code/dsp/models/utils_models.py:323-352 —
      'salimbeni'          : Z_out = Z @ W with the PCA/identity/pad W,
      'sampling'           : a prior function draw at Z,
      'salimbeni+sampling' : projection, zero-padded dims replaced by draws.

    Pass `W` to reuse the layer's identity-mean projection (SVD of the
    TRAINING inputs) so Z lands in the same PCA subspace as the propagated
    X; the default (SVD of Z) only coincides with it when Dy >= Dx.
    """
    Z = np.asarray(Z)
    in_dim = Z.shape[-1]
    if how == "salimbeni":
        W = projection_matrix(in_dim, out_dim, Z) if W is None else W
        return Z @ W
    if how == "sampling":
        f = sample_prior(spec, params, jnp.asarray(Z), 1, rng)[0]  # (Dy, M)
        return np.asarray(f).T
    if how == "salimbeni+sampling":
        W = projection_matrix(in_dim, out_dim, Z) if W is None else W
        Z_out = Z @ W
        if out_dim > in_dim:
            f = sample_prior(spec, params, jnp.asarray(Z), 1, rng)[0]
            Z_out[:, in_dim:out_dim] = np.asarray(f).T[:, in_dim:out_dim]
        return Z_out
    raise ValueError(how)
