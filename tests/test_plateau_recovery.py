"""Plateau-guard 'recover' action: reactive solve-mode fallback.

When the early-stall detector fires on a spec running a reduced-precision
solve mode, the Trainer must swap itself to trsm/'highest' IN PLACE —
optimizer moments carried, rng stream undisturbed — and keep training.
This is the reactive twin of --solve_warmup_epochs (tested in
test_fast_solves.py); the measured motivation is the power M=256
fast+'high' deterministic ELBO plateau (PARITY solve-precision section).

On CPU every solve mode computes identical fp32 math, so a recovery run
must bit-match a manual two-phase run that swaps the spec at the same
epoch boundary — any deviation means the rebuild disturbed the optimizer
state or the rng stream.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.train.trainer import Trainer
from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader


def _model(M_=16, N=96):
    rng = np.random.RandomState(0)
    X = rng.randn(N, 3)
    Y = rng.randn(N, 1)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = M.TGPSpec(Dy=1, Dx=3, M=M_, N=float(N),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1,
                                               quad_points=16), flow=fspec)
    params = M.init_tgp_params(spec, X, X[:M_], flow_inits=finits,
                               variance_scale=0.3)
    return spec, params, np.asarray(X), np.asarray(Y)


def _loaders(X, Y, batch=None):
    ds = ArrayDataset(X, Y)
    b = batch or len(ds)
    return (DataLoader(ds, b, shuffle=False), DataLoader(ds, b, shuffle=False))


def _fresh(params):
    # scan paths donate param buffers — each Trainer needs its own copy
    return jax.tree_util.tree_map(lambda x: jnp.array(np.asarray(x)), params)


# a threshold no real trajectory satisfies: the guard fires at the first
# eligible check, giving a deterministic recovery epoch for equivalence
ALWAYS_FIRE = {"window": 2, "min_rel_improve": 1e9, "max_fraction": 1.0,
               "action": "recover"}


def test_recovery_full_batch_scan_bit_matches_manual_swap():
    spec, params, X, Y = _model()
    fast = dataclasses.replace(spec, fast_solves=True, solve_precision="high")
    Y_std = np.ones(1)

    tr = Trainer(fast, _fresh(params), _loaders(X, Y), Y_std, seed=0)
    tr.plateau_guard = dict(ALWAYS_FIRE)
    tr.validate_each = 4          # chunk=4 -> first guard check at epoch 4
    tr.train(20, 0.01, "adam", verbose_each=0)

    assert tr.plateau_events and tr.plateau_events[0]["action"] == "recover"
    assert tr.plateau_events[0]["epoch"] == 4
    assert not tr.spec.fast_solves and tr.spec.solve_precision == "highest"
    assert len(tr.loss_curve) == 20 and np.isfinite(tr.loss_curve).all()
    # post-recovery events (spec already 'highest') must not claim recovery
    assert all("action" not in e for e in tr.plateau_events[1:])

    # manual arm: 4 epochs fast, swap spec, 16 more (opt state carries
    # across train() calls for the adam family)
    tr2 = Trainer(fast, _fresh(params), _loaders(X, Y), Y_std, seed=0)
    tr2.train(4, 0.01, "adam", verbose_each=0)
    tr2.spec = dataclasses.replace(fast, fast_solves=False,
                                   solve_precision="highest")
    tr2.train(16, 0.01, "adam", verbose_each=0)
    for a, b in zip(jax.tree_util.tree_leaves(tr.params),
                    jax.tree_util.tree_leaves(tr2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-8)


def test_recovery_minibatch_scan_path():
    spec, params, X, Y = _model()
    fast = dataclasses.replace(spec, fast_solves=True, solve_precision="high")
    tr = Trainer(fast, _fresh(params), _loaders(X, Y, batch=32),
                 np.ones(1), seed=0)
    tr.plateau_guard = {"window": 10, "min_rel_improve": 1e9,
                        "max_fraction": 1.0, "action": "recover"}
    tr.train(80, 0.01, "adam", verbose_each=0)   # checks run at ep%50==0
    assert tr.plateau_events and tr.plateau_events[0]["action"] == "recover"
    assert tr.plateau_events[0]["epoch"] == 50
    assert not tr.spec.fast_solves and tr.spec.solve_precision == "highest"
    assert len(tr.loss_curve) == 80 and np.isfinite(tr.loss_curve).all()


def test_recovery_streaming_path():
    spec, params, X, Y = _model()
    fast = dataclasses.replace(spec, fast_solves=True, solve_precision="high")
    seen = []
    tr = Trainer(fast, _fresh(params), _loaders(X, Y), np.ones(1), seed=0)
    tr.track_fn = lambda t: seen.append(len(t.loss_curve))  # forces streaming
    tr.plateau_guard = {"window": 10, "min_rel_improve": 1e9,
                        "max_fraction": 1.0, "action": "recover"}
    tr.train(60, 0.01, "adam", verbose_each=0)
    assert tr.plateau_events and tr.plateau_events[0]["action"] == "recover"
    assert not tr.spec.fast_solves and tr.spec.solve_precision == "highest"
    assert len(seen) == 60


def test_guard_warn_unchanged_when_spec_already_highest():
    """'recover' on an all-'highest' spec degrades to a warning — the spec
    must not be touched and no recovery event is recorded."""
    spec, params, X, Y = _model()
    tr = Trainer(spec, _fresh(params), _loaders(X, Y), np.ones(1), seed=0)
    tr.plateau_guard = dict(ALWAYS_FIRE)
    tr.validate_each = 4
    tr.train(8, 0.01, "adam", verbose_each=0)
    assert tr.plateau_events
    assert all("action" not in e for e in tr.plateau_events)
    assert tr.spec is spec
