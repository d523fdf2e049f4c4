"""RBF Gram routing under vmap.

The fused Pallas kernel's per-output scale is a VMEM (Dy, 1, 1) operand so
Pallas's auto-batching rule handles it (the original SMEM (Dy,) spec could
not batch and killed the first multi-seed battery runs on big-N corpora).
These tests pin down that (a) vmapped eligible Grams now route THROUGH the
Pallas kernel and (b) the batched values match per-replica calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.ops.pallas import rbf_gram


@pytest.fixture(autouse=True)
def _interpret_mode():
    rbf_gram.INTERPRET = jax.default_backend() != "tpu"
    yield
    rbf_gram.INTERPRET = False


def _gram_params(spec, Dy, Dx):
    return K.init_params(spec, Dy, Dx,
                         {"length_scale": 1.3, "kernel_scale": 0.7})


def test_vmap_gram_routes_through_pallas_and_matches(monkeypatch):
    spec = K.from_name("rbf")
    rng = np.random.RandomState(0)
    R, Dy, N, M, Dx = 3, 1, 32, 8, 2
    Xs = jnp.asarray(rng.randn(R, Dy, N, Dx), jnp.float32)
    Zs = jnp.asarray(rng.randn(R, Dy, M, Dx), jnp.float32)
    kp = _gram_params(spec, Dy, Dx)
    kps = jax.tree_util.tree_map(lambda l: jnp.stack([l] * R), kp)

    # reference values first, with Pallas ineligible (default threshold)
    ref = jnp.stack([
        K.gram(spec, kp, Xs[r], Zs[r], same=False) for r in range(R)])

    # force eligibility and count Pallas entries to prove the vmap path
    # actually uses the fused kernel now
    monkeypatch.setattr(K, "_PALLAS_MIN_ELEMS", 1)
    monkeypatch.setattr(rbf_gram, "pallas_available", lambda: True)
    calls = {"n": 0}
    real = rbf_gram.rbf_gram_pallas

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(rbf_gram, "rbf_gram_pallas", counting)

    out = jax.vmap(lambda x, z, p: K.gram(spec, p, x, z, same=False))(
        Xs, Zs, kps)
    assert calls["n"] == 1
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_vmap_pallas_gram_gradients_match(monkeypatch):
    """Batched custom-vjp backward agrees with the jnp expansion."""
    rng = np.random.RandomState(1)
    R, Dy, N, M, Dx = 2, 2, 24, 16, 3
    Xs = jnp.asarray(rng.randn(R, Dy, N, Dx), jnp.float32)
    Zs = jnp.asarray(rng.randn(R, Dy, M, Dx), jnp.float32)
    ks = jnp.asarray(rng.rand(R, Dy) + 0.5, jnp.float32)

    def ref_gram(x, z, k):
        d2 = (jnp.sum(x ** 2, -1)[:, :, None] + jnp.sum(z ** 2, -1)[:, None, :]
              - 2 * jnp.einsum("dnk,dmk->dnm", x, z))
        return k[:, None, None] * jnp.exp(-0.5 * jnp.maximum(d2, 0))

    def loss(fn, x, z, k):
        return jnp.sum(jnp.sin(jax.vmap(fn)(x, z, k)))

    g_p = jax.grad(loss, argnums=(1, 2, 3))(
        rbf_gram.rbf_gram_pallas, Xs, Zs, ks)
    g_r = jax.grad(loss, argnums=(1, 2, 3))(ref_gram, Xs, Zs, ks)
    for a, b in zip(g_p, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_unbatched_gram_still_routes_to_pallas(monkeypatch):
    """Plain (non-vmapped) eligible calls keep using the fused kernel."""
    spec = K.from_name("rbf")
    rng = np.random.RandomState(0)
    Dy, N, M, Dx = 1, 32, 8, 2
    X = jnp.asarray(rng.randn(Dy, N, Dx), jnp.float32)
    Z = jnp.asarray(rng.randn(Dy, M, Dx), jnp.float32)
    kp = _gram_params(spec, Dy, Dx)

    monkeypatch.setattr(K, "_PALLAS_MIN_ELEMS", 1)
    monkeypatch.setattr(rbf_gram, "pallas_available", lambda: True)

    called = {}

    import tgp.pytorch_tpu.ops.pallas.rbf_gram as rg

    def sentinel(*a, **k):
        called["yes"] = True
        raise RuntimeError("sentinel")

    monkeypatch.setattr(rg, "rbf_gram_pallas", sentinel)
    with pytest.raises(RuntimeError, match="sentinel"):
        K.gram(spec, kp, X, Z, same=False)
    assert called.get("yes")
