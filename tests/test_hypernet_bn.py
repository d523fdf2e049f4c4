"""Hypernet batch-norm (reference: flow.py:944-957 + pytorchlib.apply_linear
BN blocks): batch statistics during ELBO training, frozen recalibrated stats
at evaluation, stats excluded from optimisation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.flows.hypernet import HyperNetSpec
from tgp.pytorch_tpu.train import Trainer


def _bn_model(N=48, Dx=3):
    rng = np.random.RandomState(0)
    X = rng.randn(N, Dx)
    Y = rng.randn(N, 1)
    flow_list = G.SAL(1, input_dependent=True, input_dim=Dx,
                      batch_norm=1, dropout=0.0, hidden_dim=8,
                      hidden_activation="relu", num_hidden_layers=1,
                      inference="MC_dropout")
    fspec, finits = spec_from_list(flow_list)
    spec = M.TGPSpec(Dy=1, Dx=Dx, M=6, N=float(N),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1,
                                               quad_points=16),
                     flow=fspec)
    params = M.init_tgp_params(spec, X, X[:6], flow_inits=finits)
    return spec, params, X, Y


def _bn_leaves(params):
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        s = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if "/bn/" in s:
            out[s] = np.asarray(leaf)
    return out


def test_bn_spec_threads_through_generator():
    spec, params, _, _ = _bn_model()
    assert spec.has_bn_flow
    assert any("/bn/" in k for k in _bn_leaves(params))


def test_vi_plus_bn_raises():
    with pytest.raises(NotImplementedError):
        HyperNetSpec(in_dim=3, hidden_dim=8, batch_norm=True,
                     inference="mean_field_gaussian")


def test_bn_training_uses_batch_stats_eval_uses_stored():
    spec, params, X, Y = _bn_model()
    from tgp.pytorch_tpu.flows.core import flow_forward, FlowCtx

    fp0 = jax.tree_util.tree_map(lambda x: x[0], params["flow"])  # unstack Dy
    f = jnp.linspace(-1.0, 1.0, 16)[:, None]          # (S=16, MB=1) broadcast
    Xa = jnp.asarray(X[:8])
    Xb = jnp.asarray(X[:32])   # superset: first 8 rows shared with Xa

    # train mode: output for the same rows depends on batch composition
    tr_a = flow_forward(spec.flow, fp0, jnp.tile(f, (1, 8)), Xa,
                        FlowCtx(train=True))
    tr_b = flow_forward(spec.flow, fp0, jnp.tile(f, (1, 32)), Xb,
                        FlowCtx(train=True))
    assert not np.allclose(np.asarray(tr_a[:, :4]), np.asarray(tr_b[:, :4]))

    # eval mode (stored stats): row outputs are batch-independent
    ev_a = flow_forward(spec.flow, fp0, jnp.tile(f, (1, 8)), Xa,
                        FlowCtx(stochastic=False))
    ev_b = flow_forward(spec.flow, fp0, jnp.tile(f, (1, 32)), Xb,
                        FlowCtx(stochastic=False))
    np.testing.assert_allclose(np.asarray(ev_a[:, :8]),
                               np.asarray(ev_b[:, :8]), rtol=1e-12)


def test_bn_trainer_end_to_end_stats_frozen_then_recalibrated():
    spec, params, X, Y = _bn_model()
    stats_before = _bn_leaves(params)
    loaders = [DataLoader(ArrayDataset(X, Y), 48, seed=0),
               DataLoader(ArrayDataset(X, Y), 48, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=5)
    tr.train(30, 0.02, "adam", verbose_each=0)
    stats_after = _bn_leaves(tr.params)

    changed_gb, changed_stats = [], []
    for k, v in stats_after.items():
        moved = not np.allclose(v, stats_before[k])
        (changed_gb if k.endswith(("gamma", "beta")) else changed_stats).append(
            (k, moved))
    # gamma/beta train; mean/var only move via the finalize pass (and they
    # DO move there, away from the 0/1 init)
    assert any(m for k, m in changed_gb), "gamma/beta never trained"
    assert all(m for k, m in changed_stats), \
        f"finalize_batch_norm left stats at init: {changed_stats}"

    # metrics are finite and reproducible (stored stats, no batch coupling)
    m = tr.compute_metrics()["test"]
    assert np.isfinite(m["logL"]).all() and np.isfinite(m["rmse"]).all()


def test_bn_gradients_do_not_touch_stats():
    spec, params, X, Y = _bn_model()
    from tgp.pytorch_tpu.train.trainer import frozen_param_labels
    labels = frozen_param_labels(spec, params)
    for path, frozen in jax.tree_util.tree_leaves_with_path(labels):
        s = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
        if s.endswith("/bn/mean") or s.endswith("/bn/var"):
            assert frozen, f"{s} must be frozen"
        if s.endswith("/bn/gamma") or s.endswith("/bn/beta"):
            assert not frozen, f"{s} must be trainable"
