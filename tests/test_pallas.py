"""Pallas kernel tests (interpreter mode on CPU; compiled on TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.ops.pallas import rbf_gram
from tgp.pytorch_tpu.ops.pallas.rbf_gram import rbf_gram_pallas


@pytest.fixture(autouse=True)
def _interpret_mode():
    rbf_gram.INTERPRET = jax.default_backend() != "tpu"
    yield
    rbf_gram.INTERPRET = False


def _case(Dy=2, N=96, M=40, Dx=5, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    X1 = jnp.asarray(rng.randn(Dy, N, Dx), dtype)
    X2 = jnp.asarray(rng.randn(Dy, M, Dx), dtype)
    ks = jnp.asarray(rng.rand(Dy) + 0.5, dtype)
    return X1, X2, ks


def _reference(X1, X2, ks):
    d2 = (jnp.sum(X1 ** 2, -1)[:, :, None] + jnp.sum(X2 ** 2, -1)[:, None, :]
          - 2 * jnp.einsum("dnk,dmk->dnm", X1, X2))
    return ks[:, None, None] * jnp.exp(-0.5 * jnp.maximum(d2, 0))


def test_pallas_gram_matches_reference():
    X1, X2, ks = _case()
    out = rbf_gram_pallas(X1, X2, ks)
    ref = _reference(X1, X2, ks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_gram_nondivisible_tiles():
    # shapes not multiples of the tile sizes exercise the padded grid edge
    X1, X2, ks = _case(Dy=1, N=131, M=77, Dx=3)
    out = rbf_gram_pallas(X1, X2, ks)
    ref = _reference(X1, X2, ks)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pallas_gram_custom_vjp():
    X1, X2, ks = _case(Dy=1, N=48, M=32, Dx=4)

    def loss_p(x1):
        return jnp.sum(jnp.sin(rbf_gram_pallas(x1, X2, ks)))

    def loss_r(x1):
        return jnp.sum(jnp.sin(_reference(x1, X2, ks)))

    g_p = jax.grad(loss_p)(X1)
    g_r = jax.grad(loss_r)(X1)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=1e-4, atol=1e-4)


def test_kernels_route_through_pallas_when_enabled():
    spec = K.from_name("scale_rbf")
    X1, X2, _ = _case(Dy=1, N=600, M=600, Dx=4)
    params = K.init_params(spec, 1, 4, {"length_scale": 1.3, "kernel_scale": 0.8},
                           dtype=jnp.float32)
    old_min = K._PALLAS_MIN_ELEMS
    K._PALLAS_MIN_ELEMS = 1
    try:
        out = K.gram(spec, params, X1, X2)
    finally:
        K._PALLAS_MIN_ELEMS = old_min
    K.USE_PALLAS = False
    try:
        ref = K.gram(spec, params, X1, X2)
    finally:
        K.USE_PALLAS = True
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
