"""Deep TGP: stacked sparse variational GP layers with a flow-warped output
layer, trained with doubly-stochastic VI (Salimbeni & Deisenroth 2017).

The reference carries vestigial deep-model hooks but no working deep class:
`is_duvenaud` threading (sparse_MF_SP.py:274-340), `propagate_inducing`
salimbeni/sampling modes (utils_models.py:323-352), `GP_per_hidden_layer`
ctor arguments, and the identity/Salimbeni mean machinery (means.py:25-53)
whose whole purpose is inner-layer rank preservation.  This module is the
working realisation those hooks point at, built from this framework's layer
primitives:

  * each layer is a full TGPSpec (its marginal q(f) reuses
    models/tgp.py::marginal_qf — whitened/unwhitened, shared toggles, any
    kernel); inner layers default to the Salimbeni identity mean so f + m(x)
    keeps rank through depth,
  * forward: S Monte-Carlo samples propagate by layer-wise reparameterized
    draws f ~ N(mu_l(F), var_l(F)) (the S axis folds into the batch axis —
    one batched Gram/solve per layer, no python loop over samples),
  * ELBO = N/MB * (1/S) sum_s ELL(y | layer_L marginal at F_s)
           - sum_l KL(q(U_l) || p(U_l)) - KL_flows(last layer),
    with the final-layer ELL exact (closed form or quadrature through the
    flow) given the propagated inputs — only inner layers are sampled,
  * test log-lik: the double-integration estimator — per-sample GH
    quadrature then logsumexp over the S propagated samples minus log S
    (the deep analog of the reference's Bayesian double LSE,
    sparse_MF_SP.py:764-768).

The Trainer accepts a DeepTGPSpec transparently (models/tgp.py's public
entry points dispatch on `spec.layers`).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..ops.quadrature import GaussHermite
from ..likelihoods.gaussian import (
    noise_variance, gaussian_ell, gaussian_flow_ell,
    gaussian_moments, gaussian_flow_moments,
)
from . import tgp as tgp_mod
from .tgp import TGPSpec


@dataclasses.dataclass(frozen=True)
class DeepTGPSpec:
    """Static deep-TGP description: a tuple of layer TGPSpecs.

    layers[l].Dy is layer l's output width and must equal layers[l+1].Dx.
    The LAST layer's likelihood/flow define the observation model; inner
    layers' likelihood fields are unused.
    """

    layers: Tuple[TGPSpec, ...]
    S_train: int = 1      # reference cg.S_train (config.py:59)
    S_test: int = 100     # reference cg.S_test  (config.py:60)

    def __post_init__(self):
        for a, b in zip(self.layers, self.layers[1:]):
            if a.Dy != b.Dx:
                raise ValueError(
                    f"layer width mismatch: Dy={a.Dy} feeds Dx={b.Dx}")
        if self.layers[-1].likelihood.kind not in ("gaussian", "gaussian_flow"):
            raise NotImplementedError(
                "DeepTGP supports gaussian / gaussian_flow output layers")

    # Trainer-facing properties (match TGPSpec's surface)
    @property
    def Dy(self):
        return self.layers[-1].Dy

    @property
    def has_flow(self):
        return self.layers[-1].has_flow

    @property
    def has_stochastic_flow(self):
        return any(l.has_stochastic_flow for l in self.layers)

    @property
    def has_bn_flow(self):
        return any(l.has_bn_flow for l in self.layers)

    @property
    def likelihood(self):
        return self.layers[-1].likelihood


def layer_spec(Dx: int, Dy: int, M: int, N: float, kernel, *,
               mean: str = "identity", **kw) -> TGPSpec:
    """Convenience inner-layer spec: Salimbeni identity mean by default."""
    from ..likelihoods import LikelihoodSpec
    kw.setdefault("likelihood", LikelihoodSpec("gaussian", Dy))
    return TGPSpec(Dy=Dy, Dx=Dx, M=M, N=N, kernel=kernel, mean=mean, **kw)


def init_deep_params(spec: DeepTGPSpec, X, init_Z, *, key=None,
                     propagate: str = "salimbeni", flow_inits=None,
                     **layer_kw):
    """Per-layer parameter pytrees; inducing locations propagate through the
    stack with `propagate_inducing` (reference utils_models.py:323-352) and
    the identity-mean projections use the propagated X statistics."""
    from .utils import propagate_inducing

    if key is None:
        key = jax.random.PRNGKey(cfg.config_seed)
    X_l = np.asarray(X, np.float64)
    Z_l = np.asarray(init_Z, np.float64)
    layers = []
    for i, lsp in enumerate(spec.layers):
        key, sub = jax.random.split(key)
        is_last = i == len(spec.layers) - 1
        p = tgp_mod.init_tgp_params(
            lsp, X_l, Z_l, key=sub,
            flow_inits=flow_inits if is_last else None, **layer_kw)
        layers.append(p)
        if not is_last:
            from .means import projection_matrix
            W = projection_matrix(lsp.Dx, lsp.Dy, X_l)
            # fresh key for the propagation draw (`sub` was consumed by
            # init_tgp_params); share the X-derived W so Z lands in the
            # same PCA subspace as the propagated inputs when Dy < Dx
            key, prop_key = jax.random.split(key)
            Z_l = propagate_inducing(lsp, p, Z_l, lsp.Dy, rng=prop_key,
                                     how=propagate, W=W)
            X_l = X_l @ W
    return {"layers": layers}


def _propagate(spec: DeepTGPSpec, params, X, rng, S: int,
               deterministic: bool = False):
    """Push X (MB, D0) through the inner layers with S reparameterized
    samples.  Returns F (S*MB, D_{L-1}) — the last layer's inputs — plus the
    last-layer marginal (mu, var), each (Dy_L, S*MB).  `deterministic`
    follows the mean path (eps = 0) — the BN-recalibration contract."""
    MB = X.shape[0]
    F = jnp.broadcast_to(X[None], (S,) + X.shape).reshape(S * MB, X.shape[-1])
    for i, lsp in enumerate(spec.layers[:-1]):
        mu, var = tgp_mod.marginal_qf(lsp, params["layers"][i], F,
                                      diagonal=True)        # (Dy_l, S*MB)
        rng, sub = jax.random.split(rng)
        if deterministic:
            F = jnp.swapaxes(mu, 0, 1)                       # (S*MB, Dy_l)
            continue
        eps = jax.random.normal(sub, mu.shape, mu.dtype)
        F = jnp.swapaxes(mu + jnp.sqrt(var) * eps, 0, 1)     # (S*MB, Dy_l)
    last = spec.layers[-1]
    mu_L, var_L = tgp_mod.marginal_qf(last, params["layers"][-1], F,
                                      diagonal=True)         # (Dy_L, S*MB)
    return F, mu_L, var_L, rng


def _last_warp(spec: DeepTGPSpec, params, F, rng, stochastic, train=False):
    last = spec.layers[-1]
    F3 = tgp_mod._ensure_3d(last, F)
    return tgp_mod._make_warp(last, params["layers"][-1], F3, rng,
                              stochastic=stochastic, train=train)


def elbo(spec: DeepTGPSpec, params, X, Y, rng: Optional[jax.Array] = None):
    """Doubly-stochastic ELBO (scalar, maximise); returns (elbo, ell, kld)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    MB = X.shape[0]
    S = spec.S_train
    last = spec.layers[-1]
    F, mu, var, rng = _propagate(spec, params, X, rng, S)

    Yt = jnp.tile(Y.T, (1, S))                               # (Dy, S*MB)
    lik = last.likelihood
    lik_params = params["layers"][-1]["likelihood"]
    if lik.kind == "gaussian":
        ell = jnp.sum(gaussian_ell(lik, lik_params, Yt, mu, var)) / S
    else:
        rng, sub = jax.random.split(rng)
        warp = _last_warp(spec, params, F, sub, stochastic=True, train=True)
        ell = jnp.sum(gaussian_flow_ell(lik, lik_params, Yt, mu, var,
                                        warp)) / S

    kld = sum(jnp.sum(tgp_mod.kld_qu(lsp, params["layers"][i]))
              for i, lsp in enumerate(spec.layers))
    kld = kld + tgp_mod.flows_kld(last, params["layers"][-1])
    e = last.N / MB * ell - kld
    return e, last.N / MB * ell, kld


def test_log_likelihood(spec: DeepTGPSpec, params, X, Y, Y_std, *,
                        S_MC: int = 1, fully_bayesian: bool = False,
                        rng=None, reduce: bool = True):
    """Deep predictive log-density via the double-integration estimator:
    GH quadrature per propagated sample, then LSE over the S_test samples
    minus log S (sparse_MF_SP.py:764-768 structure).  Returns (Dy,), or
    per-point (Dy, MB) with reduce=False (the serving path's contract,
    serve.py — padding rows are masked host-side)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    S = spec.S_test
    MB = X.shape[0]
    last = spec.layers[-1]
    F, mu, var, rng = _propagate(spec, params, X, rng, S)
    gh = GaussHermite(last.likelihood.quad_points)
    gx = gh.locations(mu.dtype)
    locs = (math.sqrt(2.0) * jnp.sqrt(var)[None] * gx[:, None, None]
            + mu[None])                                      # (Q, Dy, S*MB)
    rng, sub = jax.random.split(rng)
    warp = _last_warp(spec, params, F, sub, stochastic=fully_bayesian)
    if last.has_flow:
        locs = warp(locs)
    c_y = noise_variance(last.likelihood,
                         params["layers"][-1]["likelihood"])  # (Dy, 1)
    Dy = last.Dy
    Ys = Y_std.reshape(1, Dy, 1, 1)
    y = Y.T.reshape(1, Dy, 1, MB)
    fk = locs.reshape(-1, Dy, S, MB)
    var_y = Ys ** 2 * c_y.reshape(1, Dy, 1, 1)
    # scalar log N(Ys*y | Ys*fk, Ys^2 c_y), Y_std rescale as the reference
    # (sparse_MF_SP.py:716-724)
    logp = -0.5 * (jnp.log(2 * math.pi * var_y)
                   + jnp.square(Ys * y - Ys * fk) / var_y)   # (Q, Dy, S, MB)
    logw = jnp.log(gh.weights(mu.dtype)).reshape(-1, 1, 1, 1)
    per_sample = jax.nn.logsumexp(logw + logp, axis=0) - 0.5 * math.log(math.pi)
    log_p = jax.nn.logsumexp(per_sample, axis=1) - math.log(S)  # (Dy, MB)
    return jnp.sum(log_p, axis=-1) if reduce else log_p


def predictive_distribution(spec: DeepTGPSpec, params, X, *, S_MC: int = 1,
                            fully_bayesian: bool = False, rng=None):
    """Mixture moments over the S_test propagated samples
    (sparse_MF_SP.py:499-528 structure).  Returns (m1, m2, mu, var)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    S = spec.S_test
    MB = X.shape[0]
    last = spec.layers[-1]
    F, mu, var, rng = _propagate(spec, params, X, rng, S)
    lik = last.likelihood
    lik_params = params["layers"][-1]["likelihood"]
    if lik.kind == "gaussian":
        m1s, m2s = gaussian_moments(lik, lik_params, mu, var)
    else:
        rng, sub = jax.random.split(rng)
        warp = _last_warp(spec, params, F, sub, stochastic=fully_bayesian)
        m1s, m2s = gaussian_flow_moments(lik, lik_params, mu, var, warp)
    Dy = last.Dy
    m1s = m1s.reshape(Dy, S, MB)
    m2s = m2s.reshape(Dy, S, MB)
    m1 = jnp.mean(m1s, axis=1)
    m2 = jnp.mean(m2s + m1s ** 2, axis=1) - m1 ** 2
    return m1, m2, mu, var


def sample_marginal(spec: DeepTGPSpec, params, X, S: int, rng,
                    fully_bayesian: bool = False):
    """S doubly-stochastic samples from the warped last-layer marginal:
    propagate S inner-layer paths, draw f0 ~ N(mu, var) once per path, warp.

    Matches models/tgp.py::sample_marginal's return contract
    (fk, mu, var, f0) with fk/f0 (S, Dy, MB); mu/var stay in the propagated
    (Dy, S*MB) layout (the CI callers only consume the samples)."""
    MB = X.shape[0]
    last = spec.layers[-1]
    F, mu, var, rng = _propagate(spec, params, X, rng, S)
    r1, r2 = jax.random.split(rng)
    f0 = mu + jnp.sqrt(var) * jax.random.normal(r1, mu.shape, mu.dtype)
    if last.has_flow:
        warp = _last_warp(spec, params, F, r2, stochastic=fully_bayesian)
        fk = warp(f0[None])[0]
    else:
        fk = f0
    Dy = last.Dy
    # propagated columns are S-major (s*MB + mb, see _propagate)
    to_s = lambda a: jnp.moveaxis(a.reshape(Dy, S, MB), 1, 0)
    return to_s(fk), mu, var, to_s(f0)


def sample_predictive(spec: DeepTGPSpec, params, X, S: int, rng,
                      fully_bayesian: bool = False):
    """(Dy, S, MB) predictive samples: propagate, draw the last layer, warp,
    add observation noise."""
    MB = X.shape[0]
    last = spec.layers[-1]
    F, mu, var, rng = _propagate(spec, params, X, rng, S)
    r1, r2, r3 = jax.random.split(rng, 3)
    f0 = mu + jnp.sqrt(var) * jax.random.normal(r1, mu.shape, mu.dtype)
    if last.has_flow:
        warp = _last_warp(spec, params, F, r2, stochastic=fully_bayesian)
        fk = warp(f0[None])[0]
    else:
        fk = f0
    c_y = noise_variance(last.likelihood, params["layers"][-1]["likelihood"])
    y = fk + jnp.sqrt(c_y) * jax.random.normal(r3, fk.shape, fk.dtype)
    Dy = last.Dy
    return y.reshape(Dy, S, MB), f0, mu


def finalize_batch_norm(spec: DeepTGPSpec, params, X):
    """Recalibrate any hypernet BN stats in the last layer against its
    PROPAGATED deterministic inputs (mean path, S=1)."""
    last = spec.layers[-1]
    if not last.has_bn_flow:
        return params
    F, _, _, _ = _propagate(spec, params, jnp.asarray(X, cfg.default_dtype()),
                            jax.random.PRNGKey(0), 1, deterministic=True)
    new_last = tgp_mod.finalize_batch_norm(last, params["layers"][-1], F)
    layers = list(params["layers"])
    layers[-1] = new_last
    return dict(params, layers=layers)
