"""Sharding tests on a virtual 8-device CPU mesh (SURVEY.md §4d):
sharded ELBO/grads must match the unsharded ones up to reduction order."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.parallel import (
    make_mesh, shard_batch, param_sharding, replicate, make_sharded_train_step,
    batch_sharding,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _model(Dy=1, flow=None, N=64):
    rng = np.random.RandomState(0)
    X = rng.randn(N, 3)
    Y = rng.randn(N, Dy)
    flow_inits = None
    fspec = M.IDENTITY_SPEC
    lik = "gaussian"
    if flow is not None:
        fspec, flow_inits = spec_from_list(flow)
        lik = "gaussian_flow"
    spec = M.TGPSpec(Dy=Dy, Dx=3, M=8, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec(lik, Dy, quad_points=32), flow=fspec)
    params = M.init_tgp_params(spec, X, X[:8], flow_inits=flow_inits)
    return spec, params, jnp.array(X), jnp.array(Y)


def test_dp_sharded_elbo_matches_single_device():
    spec, params, X, Y = _model()
    e_ref = float(M.elbo(spec, params, X, Y)[0])

    mesh = make_mesh(dp=8, ty=1)
    Xs, Ys = shard_batch(mesh, X, Y)
    e_sh = float(jax.jit(lambda p, x, y: M.elbo(spec, p, x, y)[0])(params, Xs, Ys))
    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-10)


def test_dp_sharded_grads_match():
    spec, params, X, Y = _model(flow=G.SAL(1))
    g_ref = jax.grad(lambda p: -M.elbo(spec, p, X, Y)[0])(params)

    mesh = make_mesh(dp=8, ty=1)
    Xs, Ys = shard_batch(mesh, X, Y)
    g_sh = jax.jit(jax.grad(lambda p, x, y: -M.elbo(spec, p, x, y)[0]))(params, Xs, Ys)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)


def test_ty_sharded_multioutput_matches():
    spec, params, X, Y = _model(Dy=4)
    e_ref = float(M.elbo(spec, params, X, Y)[0])

    mesh = make_mesh(dp=2, ty=4)
    ps = param_sharding(spec, params, mesh)
    params_sh = jax.device_put(params, ps)
    Xs, Ys = shard_batch(mesh, X, Y)
    e_sh = float(jax.jit(lambda p, x, y: M.elbo(spec, p, x, y)[0])(params_sh, Xs, Ys))
    np.testing.assert_allclose(e_sh, e_ref, rtol=1e-10)


def test_sharded_train_step_runs_and_matches():
    spec, params, X, Y = _model()
    mesh = make_mesh(dp=8, ty=1)
    opt = optax.adam(0.01)

    # reference (single device) step
    def step(p, s, x, y):
        g = jax.grad(lambda pp: -M.elbo(spec, pp, x, y)[0])(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s

    p_ref, _ = jax.jit(step)(params, opt.init(params), X, Y)

    sharded_step = make_sharded_train_step(spec, opt, mesh)
    Xs, Ys = shard_batch(mesh, X, Y)
    import copy
    p2 = jax.tree_util.tree_map(lambda a: a.copy(), params)
    p_sh, _, (e, ell, kld) = sharded_step(p2, opt.init(p2), Xs, Ys,
                                          jax.random.PRNGKey(0))
    for a, b in zip(jax.tree_util.tree_leaves(p_ref), jax.tree_util.tree_leaves(p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10)
