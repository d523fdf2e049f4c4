"""Serving API: compile-once batched predictors.

The reference has no deployment story (eval reuses the training loop's
python paths).  For production serving on TPU the constraints are:
  * fixed shapes — XLA compiles one program per input shape, so requests
    are padded to a small set of batch buckets,
  * no host round-trips inside a request — moments, quantiles and samples
    come out of a single jitted call, and the per-request PRNG advance is a
    fold_in of a call counter inside that same program (a host-side
    jax.random.split is itself a dispatched program; on a remote/tunneled
    TPU each dispatched program costs ~30 ms, so one request == ONE program),
  * explicit PRNG handling for MC-dropout (Bayesian) models.

Typical use:

    predictor = Predictor(spec, params, Y_std=..., buckets=(128, 1024))
    out = predictor.predict(Xq)                  # moments + 95% bands
    out = predictor.predict(Xq, samples=100)     # + predictive samples
    lp  = predictor.log_prob(Xq, Yq)             # per-point log-density
"""

from __future__ import annotations

import itertools
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
        self._rng = cfg.make_rng(seed)

        spec_ = spec
        fb = fully_bayesian

        # Every request costs exactly ONE dispatched program: the per-request
        # rng advance is a fold_in of a traced call counter INSIDE the jit
        # (a host-side jax.random.split is itself a dispatched program — on a
        # remote/tunneled TPU that doubles request latency), and the
        # moments/samples/quantile reduction for banded predictions is fused
        # into a single program so samples never cross the host boundary
        # unless the caller asked for them.

        # Outputs are PACKED into one device array per program: over a
        # remote/tunneled runtime every BLOCKING device->host fetch is its
        # own ~30 ms round trip, so fetching (mean, var, lower, upper) as
        # four arrays quadruples request latency; one stacked (k, Dy, MB)
        # array costs one fetch.

        @partial(jax.jit, static_argnums=(2,))
        def _moments(params, X, S_MC, base, ctr):
            rng = jax.random.fold_in(base, ctr)
            m1, m2, mu, var = tgp_mod.predictive_distribution(
                spec_, params, X, S_MC=S_MC, fully_bayesian=fb, rng=rng)
            if m2 is None:          # classification: probabilities (MB, C)
                return m1
            return jnp.stack([m1, m2])

        @partial(jax.jit, static_argnums=(2, 3, 4, 5))
        def _predict_full(params, X, S_MC, S, quantiles, return_samples,
                          base, ctr):
            rng = jax.random.fold_in(base, ctr)
            r_mom, r_smp = jax.random.split(rng)
            m1, m2, _, _ = tgp_mod.predictive_distribution(
                spec_, params, X, S_MC=S_MC, fully_bayesian=fb, rng=r_mom)
            y, _, _ = tgp_mod.sample_predictive(spec_, params, X, S, r_smp,
                                                fully_bayesian=fb)
            parts = [m1, m2]
            if quantiles:
                q = jnp.quantile(y, jnp.asarray(quantiles), axis=1)
                parts += [q[0], q[-1]]
            return jnp.stack(parts), (y if return_samples else None)

        @partial(jax.jit, static_argnums=(3,))
        def _log_prob(params, X, Y, S_MC, Y_std, base, ctr):
            # per-point densities so host-side masking of bucket padding is
            # exact with one compiled program per bucket
            rng = jax.random.fold_in(base, ctr)
            return tgp_mod.test_log_likelihood(
                spec_, params, X, Y, Y_std, S_MC=S_MC, fully_bayesian=fb,
                rng=rng, reduce=False)

        self._moments = _moments
        self._predict_full = _predict_full
        self._log_prob = _log_prob
        self._calls = itertools.count()

    def _next_rng(self):
        """(base_key, counter) pair consumed inside the jitted programs.

        The counter comes from itertools.count, whose next() is atomic
        under the GIL — concurrent predict() calls from a threaded serving
        frontend get distinct PRNG streams."""
        return self._rng, np.uint32(next(self._calls))

    def _pad(self, X):
        X = np.asarray(X, cfg.default_dtype())
        n = X.shape[0]
        if n == 0:
            # repeating X[-1:] of an empty array yields a 0-row "padded"
            # batch: XLA would compile a fresh batch-0 program (defeating
            # the bucket design) and quantiles over it are NaN
            raise ValueError("empty request (0 rows)")
        b = _bucket_for(n, self.buckets)
        if n < b:
            X = np.concatenate([X, np.repeat(X[-1:], b - n, axis=0)], axis=0)
        # returned as a HOST array: the H2D transfer then rides the jitted
        # call's dispatch instead of being its own device_put round-trip
        return X, n

    def _dispatch(self, X, samples, quantiles):
        """Enqueue one request's program; returns an opaque handle.

        JAX dispatch is asynchronous — this returns as soon as the program
        is enqueued, letting `map` overlap many requests' device round
        trips before any result is awaited."""
        if quantiles:
            # the API returns exactly (lower, upper) — silently dropping
            # extra entries or honoring an unsorted pair would swap/lose
            # bands; normalize and refuse anything but a 2-quantile band
            qs = tuple(sorted(float(q) for q in quantiles))
            if len(qs) != 2 or not 0.0 < qs[0] < qs[1] < 1.0:
                raise ValueError(
                    f"quantiles must be two values in (0, 1), got {quantiles}")
            quantiles = qs
        Xp, n = self._pad(X)
        S_MC = self.S_MC if self.fully_bayesian else 1
        base, ctr = self._next_rng()
        is_class = self.spec.likelihood.kind in ("bernoulli", "categorical")
        if is_class or not (samples or quantiles):
            packed = self._moments(self.params, Xp, S_MC, base, ctr)
            y = None
        else:
            # quantiles ride the device program ONLY when raw samples are
            # not requested (bands-only requests then cost a single small
            # fetch); when samples cross to the host anyway, quantiles are
            # cheaper there than an extra device sort + fetch.
            in_jit_q = tuple(quantiles) if (quantiles and not samples) else ()
            packed, y = self._predict_full(self.params, Xp, S_MC,
                                           samples or 200, in_jit_q,
                                           bool(samples), base, ctr)
        return (packed, y, n, samples, quantiles, is_class)

    def _materialize(self, handle):
        packed, y, n, samples, quantiles, is_class = handle
        out = {}
        ystd, ymean = self.Y_std[:, None], self.Y_mean[:, None]
        packed = np.asarray(packed)
        if is_class:  # classification: probabilities, shape (MB, C)
            out["probs"] = packed[:n]
            return out
        packed = packed[..., :n]
        out["mean"] = packed[0] * ystd + ymean
        out["var"] = packed[1] * ystd ** 2
        if samples:
            y = np.asarray(y)[..., :n] * ystd[:, None, :] + ymean[:, None, :]
            out["samples"] = y
            if quantiles:
                q = np.quantile(y, quantiles, axis=1)
                out["lower"], out["upper"] = q[0], q[-1]
        elif quantiles:  # bands-only: _dispatch put the quantiles in-jit
            out["lower"] = packed[2] * ystd + ymean
            out["upper"] = packed[3] * ystd + ymean
        return out

    def predict(self, X, samples: int = 0, quantiles=(0.025, 0.975)):
        """Predictive moments (original data scale) + optional sample-based
        quantile bands.

        Returns dict(mean (Dy,n), var, lower, upper[, samples (Dy,S,n)]).
        """
        return self._materialize(self._dispatch(X, samples, quantiles))

    def map(self, Xs, samples: int = 0, quantiles=(0.025, 0.975)):
        """Pipelined batch of independent requests.

        Dispatches every request's program before awaiting any result and
        starts all device->host copies asynchronously, so the per-request
        round-trip latency overlaps across requests instead of summing —
        sustained throughput becomes compute-bound rather than RTT-bound
        (on a tunneled TPU each awaited round trip costs ~30 ms; measured
        in benchmarks/serving.py).  Returns a list of predict() dicts in
        request order."""
        handles = [self._dispatch(X, samples, quantiles) for X in Xs]
        for packed, y, *_ in handles:
            for arr in (packed, y):
                if arr is not None and hasattr(arr, "copy_to_host_async"):
                    arr.copy_to_host_async()
        return [self._materialize(h) for h in handles]

    def log_prob(self, X, Y):
        """Per-request total predictive log-density, original data scale."""
        Xp, n = self._pad(X)
        Y = np.asarray(Y, cfg.default_dtype())
        Yp = np.concatenate(
            [Y, np.repeat(Y[-1:], Xp.shape[0] - n, axis=0)], axis=0) \
            if Y.shape[0] < Xp.shape[0] else Y
        S_MC = self.S_MC if self.fully_bayesian else 1
        base, ctr = self._next_rng()
        lpp = np.asarray(self._log_prob(
            self.params, Xp, Yp, S_MC,
            self.Y_std.astype(cfg.default_dtype()), base, ctr))
        return lpp[..., :n].sum(axis=-1)
