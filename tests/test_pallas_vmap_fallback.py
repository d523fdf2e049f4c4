"""RBF Gram routing under vmap: the fused Pallas kernel must NOT be used
for batching tracers (its SMEM per-output-scale arg cannot auto-batch —
this killed the first multi-seed battery runs on big-N corpora), and the
jnp fallback must produce the same values as per-replica calls."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.ops.pallas import rbf_gram


def _gram_params(spec, Dy, Dx):
    return K.init_params(spec, Dy, Dx,
                         {"length_scale": 1.3, "kernel_scale": 0.7})


def test_vmap_gram_routes_to_jnp_and_matches(monkeypatch):
    spec = K.from_name("rbf")
    rng = np.random.RandomState(0)
    R, Dy, N, M, Dx = 3, 1, 32, 8, 2
    Xs = jnp.asarray(rng.randn(R, Dy, N, Dx), jnp.float32)
    Zs = jnp.asarray(rng.randn(R, Dy, M, Dx), jnp.float32)
    kp = _gram_params(spec, Dy, Dx)
    kps = jax.tree_util.tree_map(
        lambda l: jnp.stack([l] * R), kp)

    # reference values first, with Pallas ineligible (default threshold)
    ref = jnp.stack([
        K.gram(spec, kp, Xs[r], Zs[r], same=False) for r in range(R)])

    # now force the Pallas route to be "eligible" and make any actual
    # Pallas call explode, so the test proves the vmap fallback fires
    monkeypatch.setattr(K, "_PALLAS_MIN_ELEMS", 1)
    monkeypatch.setattr(rbf_gram, "pallas_available", lambda: True)

    def boom(*a, **k):
        raise AssertionError("Pallas kernel must not be used under vmap")

    import tgp.pytorch_tpu.ops.pallas.rbf_gram as rg
    monkeypatch.setattr(rg, "rbf_gram_pallas", boom)

    out = jax.vmap(lambda x, z, p: K.gram(spec, p, x, z, same=False))(
        Xs, Zs, kps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_unbatched_gram_still_routes_to_pallas(monkeypatch):
    """The sentinel must fire for plain (non-vmapped) eligible calls —
    proving the fallback above is the vmap check, not dead routing."""
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
