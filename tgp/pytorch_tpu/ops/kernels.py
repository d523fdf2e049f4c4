"""Batched ARD Gram-matrix kernels (functional, MXU-friendly).

Replaces the gpytorch kernel surface used by the reference
(reference: code/dsp/models/utils_models.py:145-280 `instance_kernel` with
RBF / scale_rbf / matern32 / scale_matern32 / whitenoise / additive /
periodic-cosine spectral mixtures, all with `batch_shape=[Dy]` and ARD).

Design:
  * a kernel is a static `KernelSpec` tree (hashable) + a parameter pytree,
  * `gram(spec, params, X1, X2, same=...)` returns (Dy, N, M) Gram matrices;
    `gram_diag(spec, params, X)` returns (Dy, N) diagonals,
  * squared distances are computed with the ||x||^2 + ||z||^2 - 2 x z^T
    expansion so the O(N M Dx) term is a single batched matmul on the MXU
    (optionally in bfloat16 with float32 accumulation),
  * the white-noise kernel only contributes when `same=True`, mirroring the
    reference's `are_equal` gating (code/dsp/models/kernels.py:42-55): noise
    is added to K_xx evaluations but never to K_zz / K_xz.

Constraints follow gpytorch: raw parameters are softplus-transformed, and
initial values are loaded through inv_softplus exactly like
code/dsp/models/utils_models.py:183-204.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from .transforms import softplus, np_inv_softplus

#: route RBF Grams through the fused Pallas kernel when on TPU and the tile
#: is big enough to amortize the launch (see ops/pallas/rbf_gram.py).
USE_PALLAS = True
_PALLAS_MIN_ELEMS = 1 << 18


def _pallas_ok(X1, X2):
    if not USE_PALLAS:
        return False
    if X1.dtype not in (jnp.float32,):
        return False
    if X1.shape[0] * X1.shape[1] * X2.shape[1] < _PALLAS_MIN_ELEMS:
        return False
    from .pallas.rbf_gram import pallas_available
    return pallas_available()


@dataclasses.dataclass(frozen=True)
class KernelSpec:
    """Static kernel description (hashable; safe as a jit static arg)."""

    kind: str                                  # 'rbf'|'matern12'|'matern32'|'matern52'|'periodic'|'cosine'|'white'|'scale'|'product'|'additive'
    children: Tuple["KernelSpec", ...] = ()
    ard: bool = True

    def __post_init__(self):
        if self.kind in ("scale",) and len(self.children) != 1:
            raise ValueError("scale kernel needs exactly one child")
        if self.kind in ("product", "additive") and len(self.children) < 1:
            raise ValueError(f"{self.kind} kernel needs children")


# -- spec builders ----------------------------------------------------------

def rbf():
    return KernelSpec("rbf")


def matern(nu: float):
    return KernelSpec({0.5: "matern12", 1.5: "matern32", 2.5: "matern52"}[nu])


def periodic():
    return KernelSpec("periodic")


def cosine():
    return KernelSpec("cosine")


def white():
    return KernelSpec("white")


def scale(child: KernelSpec):
    return KernelSpec("scale", (child,))


def product(*children: KernelSpec):
    return KernelSpec("product", tuple(children))


def additive(*children: KernelSpec):
    return KernelSpec("additive", tuple(children))


def spectral_mixture(num_components: int, base: str = "periodic") -> KernelSpec:
    """Spectral-mixture composition: sum_k Periodic_k x ScaleRBF_k
    ('spectral_mixture') or Cosine_k x ScaleRBF_k ('sm').

    reference: code/dsp/models/utils_models.py:216-274 — per-component
    period/lengthscale/magnitude initial values are passed through
    `init_spectral_mixture_params`.
    """
    comp = periodic() if base == "periodic" else cosine()
    return additive(*[product(comp, scale(rbf())) for _ in range(num_components)])


def init_spectral_mixture_params(spec: KernelSpec, Dy: int, Dx: int,
                                 periods, lengthscales, magnitudes,
                                 dtype=None):
    """Per-component initialisation for `spectral_mixture` specs."""
    dtype = dtype or cfg.default_dtype()
    children = []
    for k, child in enumerate(spec.children):
        p = init_params(child, Dy, Dx, {
            "period": float(np.asarray(periods[k]).reshape(-1)[0]),
            "length_scale": float(np.asarray(lengthscales[k]).reshape(-1)[0]),
            "kernel_scale": float(np.asarray(magnitudes[k]).reshape(-1)[0]),
        }, dtype)
        children.append(p)
    return {"children": tuple(children)}


def from_name(name: str) -> KernelSpec:
    """Name-compatible factory mirroring reference `instance_kernel` names
    (code/dsp/models/utils_models.py:183-214)."""
    table = {
        "rbf": rbf(),
        "scale_rbf": scale(rbf()),
        "matern32": matern(1.5),
        "scale_matern32": scale(matern(1.5)),
        "matern52": matern(2.5),
        "scale_matern52": scale(matern(2.5)),
        "whitenoise": white(),
        "periodic": periodic(),
        "cosine": cosine(),
    }
    if name not in table:
        raise NotImplementedError(f"unknown kernel name {name!r}")
    return table[name]


# -- parameter initialisation ----------------------------------------------

def init_params(spec: KernelSpec, Dy: int, Dx: int, init: dict | None = None,
                dtype=None):
    """Build the parameter pytree for `spec`, batched over Dy outputs.

    `init` accepts the reference's init_params keys: 'length_scale',
    'kernel_scale', 'noisy_variance', 'period' (reference:
    code/main.py:95-100, code/dsp/models/utils_models.py:163-177).
    """
    init = dict(init or {})
    dtype = dtype or cfg.default_dtype()
    ls = float(init.get("length_scale", 1.0))
    ks = float(init.get("kernel_scale", 1.0))
    nv = float(init.get("noisy_variance", 1e-9))
    period = float(init.get("period", 1.0))

    ard_dims = Dx if spec.ard else 1

    def build(s: KernelSpec):
        if s.kind in ("rbf", "matern12", "matern32", "matern52"):
            raw = np.full((Dy, ard_dims), np_inv_softplus(ls))
            return {"raw_lengthscale": jnp.asarray(raw, dtype)}
        if s.kind == "periodic":
            return {
                "raw_lengthscale": jnp.asarray(np.full((Dy, ard_dims), np_inv_softplus(ls)), dtype),
                "raw_period": jnp.asarray(np.full((Dy, ard_dims), np_inv_softplus(period)), dtype),
            }
        if s.kind == "cosine":
            return {"raw_period": jnp.asarray(np.full((Dy, ard_dims), np_inv_softplus(period)), dtype)}
        if s.kind == "white":
            return {"log_variance": jnp.asarray(np.full((Dy, 1), np.log(nv)), dtype)}
        if s.kind == "scale":
            return {
                "raw_outputscale": jnp.asarray(np.full((Dy,), np_inv_softplus(ks)), dtype),
                "child": build(s.children[0]),
            }
        if s.kind in ("product", "additive"):
            return {"children": tuple(build(c) for c in s.children)}
        raise NotImplementedError(s.kind)

    return build(spec)


# -- evaluation --------------------------------------------------------------

def _scaled(X, raw_ls):
    """X / lengthscale, broadcasting ARD lengthscales (Dy,Dx) over (Dy,N,Dx)."""
    ls = softplus(raw_ls)
    return X / ls[:, None, :]


def _sq_dist(X1s, X2s):
    """Batched squared distances via the matmul expansion (MXU path).

    X1s: (Dy, N, Dx), X2s: (Dy, M, Dx) already lengthscale-scaled.
    Returns (Dy, N, M), clamped at 0.
    """
    mm_dtype = cfg.matmul_dtype()
    n1 = jnp.sum(jnp.square(X1s), axis=-1)  # (Dy, N)
    n2 = jnp.sum(jnp.square(X2s), axis=-1)  # (Dy, M)
    cross = jax.lax.dot_general(
        X1s.astype(mm_dtype), X2s.astype(mm_dtype),
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=X1s.dtype,
    )
    d2 = n1[:, :, None] + n2[:, None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def gram(spec: KernelSpec, params, X1, X2, same: bool = False):
    """Full Gram matrix K(X1, X2): (Dy, N, M).

    `same=True` means X1 and X2 are the *same* locations (adds white noise
    where a white kernel appears).  reference semantics:
    code/dsp/models/sparse_MF_SP.py:313-319 calls kernel(X, are_equal=True)
    for K_xx and are_equal=False for K_zz / K_xz.
    """
    if spec.kind == "rbf" and _pallas_ok(X1, X2):
        from .pallas.rbf_gram import rbf_gram_pallas
        X1s = _scaled(X1, params["raw_lengthscale"])
        X2s = _scaled(X2, params["raw_lengthscale"])
        return rbf_gram_pallas(X1s, X2s, jnp.ones((X1.shape[0],), X1.dtype))
    if spec.kind in ("rbf", "matern12", "matern32", "matern52"):
        d2 = _sq_dist(_scaled(X1, params["raw_lengthscale"]),
                      _scaled(X2, params["raw_lengthscale"]))
        return _stationary_from_d2(spec.kind, d2)
    if spec.kind == "periodic":
        ls = softplus(params["raw_lengthscale"])
        p = softplus(params["raw_period"])
        diff = X1[:, :, None, :] - X2[:, None, :, :]
        arg = math.pi * diff / p[:, None, None, :]
        return jnp.exp(-2.0 * jnp.sum(jnp.square(jnp.sin(arg)) / jnp.square(ls)[:, None, None, :], axis=-1))
    if spec.kind == "cosine":
        p = softplus(params["raw_period"])
        diff = X1[:, :, None, :] - X2[:, None, :, :]
        r = jnp.sqrt(jnp.sum(jnp.square(diff / p[:, None, None, :]), axis=-1) + 1e-20)
        return jnp.cos(2.0 * math.pi * r)
    if spec.kind == "white":
        N, M = X1.shape[-2], X2.shape[-2]
        if not same or N != M:
            Dy = X1.shape[0]
            return jnp.zeros((Dy, N, M), X1.dtype)
        var = jnp.exp(params["log_variance"])  # (Dy,1)
        return var[..., None] * jnp.eye(N, dtype=X1.dtype)[None]
    if spec.kind == "scale":
        ks = softplus(params["raw_outputscale"])
        child = spec.children[0]
        if child.kind == "rbf" and _pallas_ok(X1, X2):
            # fused scale*exp epilogue in one pallas pass
            from .pallas.rbf_gram import rbf_gram_pallas
            cp = params["child"]
            X1s = _scaled(X1, cp["raw_lengthscale"])
            X2s = _scaled(X2, cp["raw_lengthscale"])
            return rbf_gram_pallas(X1s, X2s, ks)
        return ks[:, None, None] * gram(child, params["child"], X1, X2, same)
    if spec.kind == "product":
        out = None
        for c, p in zip(spec.children, params["children"]):
            g = gram(c, p, X1, X2, same)
            out = g if out is None else out * g
        return out
    if spec.kind == "additive":
        out = None
        for c, p in zip(spec.children, params["children"]):
            g = gram(c, p, X1, X2, same)
            out = g if out is None else out + g
        return out
    raise NotImplementedError(spec.kind)


def _stationary_from_d2(kind: str, d2):
    if kind == "rbf":
        return jnp.exp(-0.5 * d2)
    r = jnp.sqrt(d2 + 1e-20)
    if kind == "matern12":
        return jnp.exp(-r)
    if kind == "matern32":
        a = math.sqrt(3.0) * r
        return (1.0 + a) * jnp.exp(-a)
    if kind == "matern52":
        a = math.sqrt(5.0) * r
        return (1.0 + a + (5.0 / 3.0) * d2) * jnp.exp(-a)
    raise NotImplementedError(kind)


def gram_diag(spec: KernelSpec, params, X, same: bool = True):
    """diag K(X, X): (Dy, N)."""
    Dy, N = X.shape[0], X.shape[1]
    if spec.kind in ("rbf", "matern12", "matern32", "matern52", "periodic"):
        return jnp.ones((Dy, N), X.dtype)
    if spec.kind == "cosine":
        return jnp.ones((Dy, N), X.dtype)
    if spec.kind == "white":
        if not same:
            return jnp.zeros((Dy, N), X.dtype)
        var = jnp.exp(params["log_variance"])
        return jnp.broadcast_to(var, (Dy, N)).astype(X.dtype)
    if spec.kind == "scale":
        ks = softplus(params["raw_outputscale"])
        return ks[:, None] * gram_diag(spec.children[0], params["child"], X, same)
    if spec.kind == "product":
        out = None
        for c, p in zip(spec.children, params["children"]):
            g = gram_diag(c, p, X, same)
            out = g if out is None else out * g
        return out
    if spec.kind == "additive":
        out = None
        for c, p in zip(spec.children, params["children"]):
            g = gram_diag(c, p, X, same)
            out = g if out is None else out + g
        return out
    raise NotImplementedError(spec.kind)
