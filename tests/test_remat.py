"""Rematerialization option: identical values/grads, lower live memory."""

import numpy as np
import dataclasses
import jax
import jax.numpy as jnp

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list


def test_remat_matches_plain():
    np.random.seed(0)
    N, Dx = 60, 3
    X = np.random.randn(N, Dx)
    Y = np.random.randn(N, 1)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = M.TGPSpec(Dy=1, Dx=Dx, M=8, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1, quad_points=32),
                     flow=fspec)
    params = M.init_tgp_params(spec, X, X[:8], flow_inits=finits)
    spec_r = dataclasses.replace(spec, remat=True)

    e0 = M.elbo(spec, params, jnp.asarray(X), jnp.asarray(Y))[0]
    e1 = M.elbo(spec_r, params, jnp.asarray(X), jnp.asarray(Y))[0]
    np.testing.assert_allclose(float(e0), float(e1), rtol=1e-12)

    g0 = jax.grad(lambda p: -M.elbo(spec, p, jnp.asarray(X), jnp.asarray(Y))[0])(params)
    g1 = jax.grad(lambda p: -M.elbo(spec_r, p, jnp.asarray(X), jnp.asarray(Y))[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)
