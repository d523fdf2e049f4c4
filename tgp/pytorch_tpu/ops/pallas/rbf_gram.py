"""Fused ARD-RBF Gram Pallas kernel.

Computes K[d, i, j] = ks_d * exp(-0.5 * || (x_di - z_dj) / ls_d ||^2) in one
pass: the lengthscale scaling, the squared-distance expansion (whose O(N M Dx)
term is an MXU matmul), and the exp+scale epilogue all happen in VMEM —
the (N, M) distance matrix never round-trips through HBM, which is the
fusion XLA sometimes splits when the producer matmul and consumer
elementwise ops land in different fusions.

Grid: (Dy, N/TN, M/TM); each program computes a (TN, TM) output tile from a
(TN, Dx) row block and a (TM, Dx) column block.  Backward is closed-form
(dK/dx via the same Gram), provided through jax.custom_vjp with a jnp
recomputation that XLA fuses well.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


#: set True in tests to run the kernel through the Pallas interpreter on CPU
INTERPRET = False


def pallas_available() -> bool:
    if not _HAS_PALLAS:
        return False
    if INTERPRET:
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _round_up(x, m):
    return (x + m - 1) // m * m


def _gram_kernel(x_ref, z_ref, ks_ref, out_ref):
    # x: (1, TN, Dx) already lengthscale-scaled; z: (1, TM, Dx) scaled
    # ks: (1, 1, 1) per-output scale in VMEM (not SMEM: VMEM blocks batch
    # cleanly under vmap, which the multi-seed batteries rely on)
    x = x_ref[0]
    z = z_ref[0]
    xn = jnp.sum(jnp.square(x), axis=-1, keepdims=True)          # (TN, 1)
    zn = jnp.sum(jnp.square(z), axis=-1, keepdims=True).T        # (1, TM)
    cross = jax.lax.dot_general(
        x, z, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d2 = jnp.maximum(xn + zn - 2.0 * cross, 0.0)
    out_ref[0] = (ks_ref[0, 0, 0] * jnp.exp(-0.5 * d2)).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def rbf_gram_pallas(X1s, X2s, ks):
    """K = ks[:, None, None] * exp(-0.5 * d2(X1s, X2s)) via Pallas.

    Args:
      X1s: (Dy, N, Dx) lengthscale-scaled inputs.
      X2s: (Dy, M, Dx) lengthscale-scaled inputs.
      ks:  (Dy,) output scales.
    """
    return _forward(X1s, X2s, ks)


def _forward(X1s, X2s, ks):
    Dy, N, Dx = X1s.shape
    M = X2s.shape[1]
    TN = min(512, _round_up(N, 8))
    TM = min(512, _round_up(M, 128))
    grid = (Dy, pl.cdiv(N, TN), pl.cdiv(M, TM))

    out = pl.pallas_call(
        _gram_kernel,
        out_shape=jax.ShapeDtypeStruct((Dy, N, M), X1s.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TN, Dx), lambda d, i, j: (d, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TM, Dx), lambda d, i, j: (d, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda d, i, j: (d, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TN, TM), lambda d, i, j: (d, i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * Dy * N * M * Dx + 4 * Dy * N * M,
            bytes_accessed=4 * Dy * (N * Dx + M * Dx + N * M),
            transcendentals=Dy * N * M,
        ),
        interpret=INTERPRET,
    )(X1s, X2s, ks.reshape(Dy, 1, 1))
    return out


def _fwd(X1s, X2s, ks):
    K = _forward(X1s, X2s, ks)
    return K, (X1s, X2s, ks, K)


def _bwd(res, g):
    X1s, X2s, ks, K = res
    # dK/dX1s[i] = sum_j g_ij * K_ij * (X2s[j] - X1s[i])
    gK = g * K
    row = jnp.sum(gK, axis=-1)                                   # (Dy, N)
    col = jnp.sum(gK, axis=-2)                                   # (Dy, M)
    dX1 = jnp.einsum("dnm,dmk->dnk", gK, X2s) - row[..., None] * X1s
    dX2 = jnp.einsum("dnm,dnk->dmk", gK, X1s) - col[..., None] * X2s
    # dK/dks = exp(-0.5 d2), recomputed directly rather than as K/ks:
    # ks = softplus(raw) underflows to 0.0 in fp32 for very negative raw,
    # where the division would emit inf/NaN (and a max-guard would zero the
    # gradient, stranding ks) while the non-Pallas path stays exact
    d2 = jnp.maximum(
        jnp.sum(jnp.square(X1s), -1)[..., :, None]
        + jnp.sum(jnp.square(X2s), -1)[..., None, :]
        - 2.0 * jnp.einsum("dnk,dmk->dnm", X1s, X2s), 0.0)
    dks = jnp.sum(g * jnp.exp(-0.5 * d2), axis=(-2, -1))
    return dX1, dX2, dks


rbf_gram_pallas.defvjp(_fwd, _bwd)
