"""Trainer(mesh=...) end-to-end multi-device training (SURVEY.md §2.3 DP/TP
rows): sharded training through the real Trainer API must reproduce the
unsharded parameters bit-closely, on both scan fast paths."""

import numpy as np
import jax
import pytest

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.parallel import make_mesh
from tgp.pytorch_tpu.train import Trainer

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _setup(N, Dy=1, flow=None):
    rng = np.random.RandomState(0)
    X = rng.randn(N, 3)
    Y = rng.randn(N, Dy)
    fspec, finits, lik = M.IDENTITY_SPEC, None, "gaussian"
    if flow is not None:
        fspec, finits = spec_from_list(flow)
        lik = "gaussian_flow"
    spec = M.TGPSpec(Dy=Dy, Dx=3, M=8, N=float(N),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec(lik, Dy, quad_points=32),
                     flow=fspec)
    params = M.init_tgp_params(spec, X, X[:8], flow_inits=finits)
    return spec, params, X, Y


def _leaves_close(pa, pb, rtol=1e-7, atol=1e-8):
    # per-step grads match at 1e-8 (test_sharding.py); accumulated over tens
    # of Adam steps the cross-device reduction order drifts to O(1e-9) abs
    for a, b in zip(jax.tree_util.tree_leaves(pa),
                    jax.tree_util.tree_leaves(pb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=rtol, atol=atol)


def _train(spec, params, X, Y, batch, mesh, epochs=50, seed=2):
    # the train step donates parameter buffers — give each run its own copy
    params = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), params)
    loaders = [DataLoader(ArrayDataset(X, Y), batch, seed=seed),
               DataLoader(ArrayDataset(X, Y), batch, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(Y.shape[1]),
                 S_test=10, seed=seed, mesh=mesh)
    tr.train(epochs, 0.05, "adam", verbose_each=0)
    return tr


def test_full_batch_scan_dp_sharded_matches_unsharded():
    spec, params, X, Y = _setup(N=64, flow=G.SAL(1))
    p_ref = _train(spec, params, X, Y, batch=64, mesh=None).params
    mesh = make_mesh(dp=8, ty=1)
    p_sh = _train(spec, params, X, Y, batch=64, mesh=mesh).params
    _leaves_close(p_ref, p_sh)


def test_full_batch_scan_dp_ty_sharded_matches_unsharded():
    spec, params, X, Y = _setup(N=64, Dy=4)
    p_ref = _train(spec, params, X, Y, batch=64, mesh=None).params
    mesh = make_mesh(dp=2, ty=4)
    p_sh = _train(spec, params, X, Y, batch=64, mesh=mesh).params
    _leaves_close(p_ref, p_sh)


def test_minibatch_scan_dp_sharded_matches_unsharded():
    # 96 rows, batch 32 -> 3 scanned batches per epoch, each dp-sharded
    spec, params, X, Y = _setup(N=96, flow=G.SAL(1))
    p_ref = _train(spec, params, X, Y, batch=32, mesh=None, epochs=10).params
    mesh = make_mesh(dp=8, ty=1)
    p_sh = _train(spec, params, X, Y, batch=32, mesh=mesh, epochs=10).params
    # 30 sharded Adam steps: reduction-order drift reaches O(1e-8) abs (the
    # unsharded device-vs-host equivalence test itself allows 5e-5)
    _leaves_close(p_ref, p_sh, rtol=1e-6, atol=1e-7)


def test_indivisible_batch_falls_back_to_replicated():
    # N=60 does not divide dp=8: training must still run and match
    spec, params, X, Y = _setup(N=60)
    p_ref = _train(spec, params, X, Y, batch=60, mesh=None, epochs=10).params
    mesh = make_mesh(dp=8, ty=1)
    p_sh = _train(spec, params, X, Y, batch=60, mesh=mesh, epochs=10).params
    _leaves_close(p_ref, p_sh)


def test_sharded_eval_metrics_match():
    spec, params, X, Y = _setup(N=64, flow=G.SAL(1))
    tr_ref = _train(spec, params, X, Y, batch=64, mesh=None, epochs=20)
    mesh = make_mesh(dp=4, ty=1, devices=jax.devices()[:4])
    tr_sh = _train(spec, params, X, Y, batch=64, mesh=mesh, epochs=20)
    m_ref = tr_ref.compute_metrics()["test"]
    m_sh = tr_sh.compute_metrics()["test"]
    np.testing.assert_allclose(m_ref["logL"], m_sh["logL"], rtol=1e-6)
    np.testing.assert_allclose(m_ref["rmse"], m_sh["rmse"], rtol=1e-6)
