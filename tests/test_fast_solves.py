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


def test_solve_warmup_spec_swap_mid_run():
    """experiments/main.py --solve_warmup_epochs trains a 'highest' warmup
    phase then swaps trainer.spec to the requested solve mode with the Adam
    moments carried.  On CPU every mode computes the same fp32 math, so the
    two-phase run must bit-match an uninterrupted single-spec run."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "experiments"))
    from tgp.pytorch_tpu.train.trainer import Trainer
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader

    spec, params, X, Y = _model()
    fast = dataclasses.replace(spec, fast_solves=True,
                               solve_precision="high")
    ds = ArrayDataset(np.asarray(X), np.asarray(Y))
    loaders = (DataLoader(ds, len(ds), shuffle=False),
               DataLoader(ds, len(ds), shuffle=False))
    Y_std = np.ones(1)

    # the scan fast path donates the param buffers, so each Trainer needs
    # its own copy of the initial pytree
    def fresh():
        return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)),
                                      params)

    tr = Trainer(fast, fresh(), loaders, Y_std, seed=0)
    tr.train(20, 0.01, "adam")
    ref_leaves = jax.tree_util.tree_leaves(tr.params)

    # two-phase: 8 epochs on the all-'highest' spec, swap, 12 more
    tr2 = Trainer(spec, fresh(), loaders, Y_std, seed=0)
    tr2.train(8, 0.01, "adam")
    tr2.spec = fast
    tr2.train(12, 0.01, "adam")
    for a, b in zip(ref_leaves, jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-8)
