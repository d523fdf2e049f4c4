"""fast_solves (explicit L^{-1} GEMM) must reproduce the trsm path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list


def _model(M_=32, N=96):
    rng = np.random.RandomState(0)
    X = rng.randn(N, 3)
    Y = rng.randn(N, 1)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = M.TGPSpec(Dy=1, Dx=3, M=M_, N=float(N),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1,
                                               quad_points=32), flow=fspec)
    params = M.init_tgp_params(spec, X, X[:M_], flow_inits=finits,
                               variance_scale=0.3)
    return spec, params, jnp.asarray(X), jnp.asarray(Y)


def test_fast_solves_matches_trsm_path():
    spec, params, X, Y = _model()
    fast = dataclasses.replace(spec, fast_solves=True)

    mu0, v0 = M.marginal_qf(spec, params, X)
    mu1, v1 = M.marginal_qf(fast, params, X)
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu0),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-8, atol=1e-12)

    e0 = M.elbo(spec, params, X, Y)[0]
    e1 = M.elbo(fast, params, X, Y)[0]
    np.testing.assert_allclose(float(e1), float(e0), rtol=1e-10)

    g0 = jax.grad(lambda p: -M.elbo(spec, p, X, Y)[0])(params)
    g1 = jax.grad(lambda p: -M.elbo(fast, p, X, Y)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-7, atol=1e-9)


def test_solve_precision_modes_agree_on_cpu():
    """solve_precision only changes MXU pass counts — on the CPU backend
    every mode is exact fp32, so all three must agree bitwise-closely and
    stay differentiable (the TPU deltas are measured in
    benchmarks/solve_precision.py)."""
    spec, params, X, Y = _model()
    base = dataclasses.replace(spec, fast_solves=True)
    e0 = M.elbo(base, params, X, Y)[0]
    for prec in ("high", "default"):
        sp = dataclasses.replace(base, solve_precision=prec)
        e1 = M.elbo(sp, params, X, Y)[0]
        np.testing.assert_allclose(float(e1), float(e0), rtol=1e-6)
        g = jax.grad(lambda p: -M.elbo(sp, p, X, Y)[0])(params)
        assert all(np.isfinite(l).all() for l in
                   map(np.asarray, jax.tree_util.tree_leaves(g)))
