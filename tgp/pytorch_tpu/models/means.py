"""Mean functions: zero, identity (Salimbeni-style projection), linear.

reference: code/dsp/models/means.py:25-74 and
code/dsp/models/utils_models.py:285-315 (`return_mean`,
`return_projection_matrix`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg


def projection_matrix(Dx: int, Dy: int, X: np.ndarray) -> np.ndarray:
    """Projection W (Dx, Dy) for the identity mean.

    Cases (reference: code/dsp/models/utils_models.py:299-315):
      Dy == Dx : identity;  Dy > Dx : identity + zero pad;
      Dy < Dx  : PCA via SVD of the training inputs.
    """
    X = np.asarray(X)
    if Dy == Dx:
        return np.eye(Dx)
    if Dy > Dx:
        return np.concatenate([np.eye(Dx), np.zeros((Dx, Dy - Dx))], axis=1)
    _, _, V = np.linalg.svd(X, full_matrices=False)
    return V[:Dy, :].T


def mean_init(kind: str, Dy: int, Dx: int, X=None, dtype=None, seed: int | None = None):
    """Parameter pytree for a mean function.

    'identity' stores W as a (frozen) parameter — the trainer masks it from
    optimisation, mirroring the reference's register_buffer
    (code/dsp/models/means.py:44-47).
    """
    dtype = dtype or cfg.default_dtype()
    if kind == "zero":
        return {}
    if kind == "identity":
        W = projection_matrix(Dx, Dy, X)          # (Dx, Dy)
        return {"W": jnp.asarray(W.T, dtype)}     # stored (Dy, Dx)
    if kind == "linear":
        rng = np.random.RandomState(cfg.config_seed if seed is None else seed)
        return {
            "a": jnp.asarray(rng.randn(Dy, Dx), dtype),
            "b": jnp.zeros((Dy, 1), dtype),
        }
    raise NotImplementedError(kind)


def mean_apply(kind: str, params, X):
    """m(X): X (Dy, N, Dx) -> (Dy, N)."""
    if kind == "zero":
        return jnp.zeros(X.shape[:-1], X.dtype)
    if kind == "identity":
        return jnp.einsum("dnk,dk->dn", X, params["W"])
    if kind == "linear":
        return jnp.einsum("dnk,dk->dn", X, params["a"]) + params["b"]
    raise NotImplementedError(kind)
