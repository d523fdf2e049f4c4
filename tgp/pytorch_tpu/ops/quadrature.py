"""Gauss-Hermite quadrature with baked constant nodes.

The reference integrates 1-D expectations w.r.t. Gaussians with gpytorch's
`GaussHermiteQuadrature1D` (reference: code/dsp/models/sparse_MF_SP.py:102-105,
code/dsp/likelihoods/GaussianNonLinearMean.py:45).  Identical math:

    E_{N(f | mu, s^2)}[ g(f) ]  ~=  1/sqrt(pi) * sum_i  w_i g(sqrt(2) s x_i + mu)

with (x_i, w_i) the *physicists'* Hermite nodes/weights.  On TPU the nodes
are baked as compile-time constants and the contraction is a single
weighted reduction that XLA fuses into whatever `g` lowers to.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _herm_nodes(n: int):
    x, w = np.polynomial.hermite.hermgauss(n)
    return x, w


def gauss_hermite(n: int, dtype=jnp.float64):
    """Return (locations, weights) as jnp constants of the given dtype."""
    x, w = _herm_nodes(n)
    return jnp.asarray(x, dtype=dtype), jnp.asarray(w, dtype=dtype)


class GaussHermite:
    """Stateless GH integrator.

    `integrate(g, mu, var)` computes E_{N(mu, var)}[g(f)] elementwise over the
    trailing shape of mu/var.  `g` receives samples of shape (S, *mu.shape)
    and must return the same shape (or broadcastable); the S axis is reduced
    with the normalized weights.  Mirrors gpytorch's calling convention used
    throughout the reference likelihoods.
    """

    def __init__(self, n: int):
        self.n = int(n)

    def locations(self, dtype):
        return gauss_hermite(self.n, dtype)[0]

    def weights(self, dtype):
        return gauss_hermite(self.n, dtype)[1]

    def shifted_locations(self, mu, var):
        """sqrt(2*var) * x_i + mu, shape (S, *mu.shape).

        reference: code/dsp/models/sparse_MF_SP.py:705-714.
        """
        x = self.locations(mu.dtype)
        x = x.reshape((self.n,) + (1,) * mu.ndim)
        return jnp.sqrt(2.0 * var)[None] * x + mu[None]

    def reduce(self, vals):
        """Weighted reduction over the leading S axis (1/sqrt(pi) sum w_i .)."""
        w = self.weights(vals.dtype)
        w = w.reshape((self.n,) + (1,) * (vals.ndim - 1))
        return jnp.sum(w * vals, axis=0) / math.sqrt(math.pi)

    def integrate(self, g, mu, var):
        f = self.shifted_locations(mu, var)
        return self.reduce(g(f))
