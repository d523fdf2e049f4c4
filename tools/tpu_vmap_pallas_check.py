"""Real-TPU check: vmapped Pallas RBF Gram (VMEM scale) vs jnp path."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from tgp.pytorch_tpu import config as cfg
cfg.set_precision("fp32")

from tgp.pytorch_tpu.ops.pallas.rbf_gram import rbf_gram_pallas

rng = np.random.RandomState(0)
R, Dy, N, M, Dx = 3, 1, 2048, 100, 4
Xs = jnp.asarray(rng.randn(R, Dy, N, Dx), jnp.float32)
Zs = jnp.asarray(rng.randn(R, Dy, M, Dx), jnp.float32)
ks = jnp.asarray(rng.rand(R, Dy) + 0.5, jnp.float32)


def ref_gram(x, z, k):
    d2 = (jnp.sum(x ** 2, -1)[:, :, None] + jnp.sum(z ** 2, -1)[:, None, :]
          - 2 * jnp.einsum("dnk,dmk->dnm", x, z))
    return k[:, None, None] * jnp.exp(-0.5 * jnp.maximum(d2, 0))


out = jax.jit(jax.vmap(rbf_gram_pallas))(Xs, Zs, ks)
ref = jax.jit(jax.vmap(ref_gram))(Xs, Zs, ks)
err = float(jnp.max(jnp.abs(out - ref)))
print("fwd max abs err:", err)
assert err < 2e-5, err


def loss(fn, x, z, k):
    return jnp.sum(jnp.sin(jax.vmap(fn)(x, z, k)))


gp = jax.jit(jax.grad(loss, argnums=(1, 2, 3)), static_argnums=0)(
    rbf_gram_pallas, Xs, Zs, ks)
gr = jax.jit(jax.grad(loss, argnums=(1, 2, 3)), static_argnums=0)(
    ref_gram, Xs, Zs, ks)
for a, b in zip(gp, gr):
    scale = float(jnp.max(jnp.abs(b))) + 1e-6
    e = float(jnp.max(jnp.abs(a - b)))
    print(f"grad max abs err: {e:.3e}  (rel {e / scale:.3e})")
    assert e / scale < 1e-4, (e, scale)

# unbatched still fine
o1 = jax.jit(rbf_gram_pallas)(Xs[0], Zs[0], ks[0])
r1 = jax.jit(ref_gram)(Xs[0], Zs[0], ks[0])
print("unbatched max abs err:", float(jnp.max(jnp.abs(o1 - r1))))
print("TPU_VMAP_PALLAS_OK")
