"""Positive-parameter transforms.

reference: code/dsp/utils.py:39-55 (`positive_transform` /
`inverse_positive_transform`, configurable 'exp' vs 'softplus' — the
experiments use 'exp', code/dsp/config.py:61) and gpytorch's
`inv_softplus` used by kernel/flow initialisers.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def softplus(x):
    return jnp.logaddexp(x, 0.0)


import jax


@jax.custom_jvp
def safe_sinh(x):
    """sinh with the argument clipped dtype-dependently (30 in fp32, 300 in
    fp64 — values 5e12 / 1e130, far beyond any statistically meaningful
    warp output).

    Rationale: if sinh reaches inf, any downstream clip produces a zero
    cotangent that meets cosh(inf)=inf in the VJP, and 0*inf = NaN poisons
    the whole gradient.  The reference never hits this because it runs fp64
    where the flows stay in range for its experiments; an fp32 TPU run of
    the input-dependent SAL flows does hit it (hypernet-emitted b grows
    until b*asinh(f) > 89).

    Custom JVP: d sinh = cosh = sqrt(1 + sinh^2) reuses the primal value —
    one fewer transcendental per element in the backward pass of every flow
    chain (the quadrature grid makes this S*Dy*MB elements per step).

    The forward uses the single-exp identity sinh = (e - 1/e)/2 instead of
    jnp.sinh: one exp + one reciprocal beats the library lowering's two
    exps on the VPU (+14% on the full TGP power training step).
    """
    lim = 30.0 if jnp.asarray(x).dtype == jnp.float32 else 300.0
    e = jnp.exp(jnp.clip(x, -lim, lim))
    return 0.5 * (e - 1.0 / e)


@safe_sinh.defjvp
def _safe_sinh_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    lim = 30.0 if jnp.asarray(x).dtype == jnp.float32 else 300.0
    inside = (x > -lim) & (x < lim)
    e = jnp.exp(jnp.clip(x, -lim, lim))
    y = 0.5 * (e - 1.0 / e)
    dy = jnp.where(inside, jnp.sqrt(1.0 + jnp.square(y)), 0.0) * dx
    return y, dy


def safe_exp(x):
    """exp with the argument clipped below the overflow threshold
    (same 0*inf-in-VJP rationale as safe_sinh)."""
    lim = 80.0 if jnp.asarray(x).dtype == jnp.float32 else 700.0
    return jnp.exp(jnp.clip(x, -jnp.inf, lim))


def safe_tanh(x):
    """tanh with the argument clipped to +-30.

    Mathematically exact (tanh saturates to 1 ulp of +-1 well before 30) but
    avoids a TPU XLA lowering that returns NaN for very large finite
    arguments (observed on v5e: tanh(1e3) -> nan in the expansion used by
    the backend).  Flows feed unbounded GP samples into tanh, so this
    matters in practice.
    """
    return jnp.tanh(jnp.clip(x, -30.0, 30.0))


def inv_softplus(x):
    """Numerically-stable inverse of softplus: log(exp(x) - 1)."""
    x = jnp.asarray(x)
    # For large x, log(exp(x)-1) ~= x + log1p(-exp(-x))
    return x + jnp.log(-jnp.expm1(-x))


def np_inv_softplus(x):
    x = np.asarray(x, dtype=np.float64)
    return x + np.log(-np.expm1(-x))


def positive(x, kind: str = "exp"):
    """Map unconstrained parameter to a strictly positive value."""
    if kind == "exp":
        return jnp.exp(x)
    if kind == "softplus":
        return softplus(x)
    raise NotImplementedError(kind)


def inverse_positive(x, kind: str = "exp"):
    if kind == "exp":
        return jnp.log(x)
    if kind == "softplus":
        return inv_softplus(x)
    raise NotImplementedError(kind)
