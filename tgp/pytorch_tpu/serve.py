"""Serving API: compile-once batched predictors.

The reference has no deployment story (eval reuses the training loop's
python paths).  For production serving on TPU the constraints are:
  * fixed shapes — XLA compiles one program per input shape, so requests
    are padded to a small set of batch buckets,
  * no host round-trips inside a request — moments, quantiles and samples
    come out of a single jitted call,
  * explicit PRNG handling for MC-dropout (Bayesian) models.

Typical use:

    predictor = Predictor(spec, params, Y_std=..., buckets=(128, 1024))
    out = predictor.predict(Xq)                  # moments + 95% bands
    out = predictor.predict(Xq, samples=100)     # + predictive samples
    lp  = predictor.log_prob(Xq, Yq)             # per-point log-density
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import config as cfg
from .models import tgp as tgp_mod
from .models.tgp import TGPSpec


def _bucket_for(n: int, buckets):
    for b in buckets:
        if n <= b:
            return b
    raise ValueError(f"batch of {n} exceeds the largest bucket {buckets[-1]}; "
                     f"shard the request or add a bucket")


class Predictor:
    """Compile-once predictive service for a trained TGP.

    Args:
      spec, params: the trained model.
      Y_std, Y_mean: de-normalisation of the regressed variable (outputs are
        returned in the original data scale).
      buckets: allowed padded batch sizes (one XLA program each).
      fully_bayesian: MC-dropout flow marginalisation with S_MC draws.
    """

    def __init__(self, spec: TGPSpec, params, Y_std=1.0, Y_mean=0.0,
                 buckets=(256, 4096), S_MC: int = 100,
                 fully_bayesian: bool = False, seed: int = 0):
        self.spec = spec
        self.params = params
        self.Y_std = np.asarray(Y_std, dtype=np.float64).reshape(-1)
        self.Y_mean = np.asarray(Y_mean, dtype=np.float64).reshape(-1)
        self.buckets = tuple(sorted(buckets))
        self.S_MC = S_MC
        self.fully_bayesian = fully_bayesian
        self._rng = jax.random.PRNGKey(seed)

        spec_ = spec
        fb = fully_bayesian

        @partial(jax.jit, static_argnums=(2,))
        def _moments(params, X, S_MC, rng):
            m1, m2, mu, var = tgp_mod.predictive_distribution(
                spec_, params, X, S_MC=S_MC, fully_bayesian=fb, rng=rng)
            return m1, m2, mu, var

        @partial(jax.jit, static_argnums=(2,))
        def _samples(params, X, S, rng):
            y, fk, f0 = tgp_mod.sample_predictive(spec_, params, X, S, rng,
                                                  fully_bayesian=fb)
            return y

        @partial(jax.jit, static_argnums=(3,))
        def _log_prob(params, X, Y, S_MC, Y_std, rng):
            # per-point densities so host-side masking of bucket padding is
            # exact with one compiled program per bucket
            return tgp_mod.test_log_likelihood(
                spec_, params, X, Y, Y_std, S_MC=S_MC, fully_bayesian=fb,
                rng=rng, reduce=False)

        self._moments = _moments
        self._samples = _samples
        self._log_prob = _log_prob

    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _pad(self, X):
        X = np.asarray(X, cfg.default_dtype())
        n = X.shape[0]
        b = _bucket_for(n, self.buckets)
        if n < b:
            X = np.concatenate([X, np.repeat(X[-1:], b - n, axis=0)], axis=0)
        return jnp.asarray(X), n

    def predict(self, X, samples: int = 0, quantiles=(0.025, 0.975)):
        """Predictive moments (original data scale) + optional sample-based
        quantile bands.

        Returns dict(mean (Dy,n), var, lower, upper[, samples (Dy,S,n)]).
        """
        Xp, n = self._pad(X)
        S_MC = self.S_MC if self.fully_bayesian else 1
        m1, m2, _, _ = self._moments(self.params, Xp, S_MC, self._next_rng())
        out = {}
        ystd, ymean = self.Y_std[:, None], self.Y_mean[:, None]
        if m2 is None:  # classification: m1 are probabilities, shape (MB, C)
            out["probs"] = np.asarray(m1)[:n]
            return out
        m1 = np.asarray(m1)[..., :n]       # regression: (Dy, MB) -> trim batch
        m2 = np.asarray(m2)[..., :n]
        out["mean"] = m1 * ystd + ymean
        out["var"] = m2 * ystd ** 2
        if samples or quantiles:
            S = samples or 200
            y = np.asarray(self._samples(self.params, Xp, S, self._next_rng()))
            y = y[..., :n] * ystd[:, None, :] + ymean[:, None, :]
            if quantiles:
                q = np.quantile(y, quantiles, axis=1)
                out["lower"], out["upper"] = q[0], q[-1]
            if samples:
                out["samples"] = y
        return out

    def log_prob(self, X, Y):
        """Per-request total predictive log-density, original data scale."""
        Xp, n = self._pad(X)
        Y = np.asarray(Y, cfg.default_dtype())
        Yp = np.concatenate(
            [Y, np.repeat(Y[-1:], Xp.shape[0] - n, axis=0)], axis=0) \
            if Y.shape[0] < Xp.shape[0] else Y
        S_MC = self.S_MC if self.fully_bayesian else 1
        lpp = np.asarray(self._log_prob(self.params, Xp, jnp.asarray(Yp), S_MC,
                                        jnp.asarray(self.Y_std),
                                        self._next_rng()))
        return lpp[..., :n].sum(axis=-1)
