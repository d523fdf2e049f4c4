"""Checkpoint roundtrip + driver entry-point tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, latest_step)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(4.0), "nested": [{"W": jnp.eye(3)}]}
    save_checkpoint(str(tmp_path), params, step=10, extra={"lr": 0.01})
    save_checkpoint(str(tmp_path), params, step=20)
    assert latest_step(str(tmp_path)) == 20
    p, opt, step, extra = load_checkpoint(str(tmp_path), step=10)
    np.testing.assert_array_equal(p["a"], np.arange(4.0))
    np.testing.assert_array_equal(p["nested"][0]["W"], np.eye(3))
    assert extra["lr"] == 0.01 and step == 10


def test_checkpoint_async_save_roundtrip(tmp_path):
    from tgp.pytorch_tpu.train.checkpoint import wait_for_checkpoints
    params = {"a": jnp.arange(6.0), "b": {"W": jnp.eye(2)}}
    save_checkpoint(str(tmp_path), params, step=3, async_save=True)
    wait_for_checkpoints()  # block until the background flush is durable
    p, _, step, _ = load_checkpoint(str(tmp_path))
    assert step == 3
    np.testing.assert_array_equal(p["a"], np.arange(6.0))


def test_checkpoint_preserves_custom_pytree_structure(tmp_path):
    from tgp.pytorch_tpu.train.group_adam import GroupAdamState, init_state
    params = {"a": jnp.arange(4.0), "b": {"W": jnp.eye(2)}}
    state = init_state(params)
    save_checkpoint(str(tmp_path), params, step=1, opt_state=state)
    _, opt, _, _ = load_checkpoint(str(tmp_path), step=1)
    assert isinstance(opt, GroupAdamState), type(opt)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(opt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_resume_mid_run_bit_exact(tmp_path):
    """Interrupt at epoch 20 of 40, restore into a FRESH Trainer, continue:
    parameters must match the uninterrupted two-call run bit-exactly
    (grouped-adam moments + rng stream both round-trip)."""
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.train import Trainer

    rng = np.random.RandomState(0)
    X, Y = rng.randn(40, 3), rng.randn(40, 1)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = M.TGPSpec(Dy=1, Dx=3, M=5, N=40.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1,
                                               quad_points=16), flow=fspec)
    params = M.init_tgp_params(spec, X, X[:5], flow_inits=finits)
    copy = lambda p: jax.tree_util.tree_map(lambda x: np.array(x, copy=True), p)
    mk = lambda: [DataLoader(ArrayDataset(X, Y), 64, seed=0),
                  DataLoader(ArrayDataset(X, Y), 64, shuffle=False)]

    # uninterrupted: two sequential train() calls on one Trainer
    tr_a = Trainer(spec, copy(params), mk(), Y_std=np.ones(1), S_test=5, seed=7)
    tr_a.train(20, 0.02, "adam", verbose_each=0)
    tr_a.train(20, 0.02, "adam", verbose_each=0)

    # interrupted: train, checkpoint, restore into a fresh Trainer, continue
    tr_b = Trainer(spec, copy(params), mk(), Y_std=np.ones(1), S_test=5, seed=7)
    tr_b.train(20, 0.02, "adam", verbose_each=0)
    tr_b.save(str(tmp_path))
    tr_c = Trainer(spec, copy(params), mk(), Y_std=np.ones(1), S_test=5,
                   seed=999)  # wrong seed on purpose; restore overwrites rng
    tr_c.restore(str(tmp_path))
    tr_c.train(20, 0.02, "adam", verbose_each=0)

    for a, b in zip(jax.tree_util.tree_leaves(tr_a.params),
                    jax.tree_util.tree_leaves(tr_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_graft_entry_single():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_entry_multichip():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_latest_step_ignores_orbax_tmp_dirs(tmp_path):
    """A crashed/in-flight orbax write leaves step_<N>.orbax-checkpoint-
    tmp-<ts>; resume must skip it instead of raising ValueError."""
    import os
    from tgp.pytorch_tpu.train import checkpoint as C
    os.makedirs(tmp_path / "step_5")
    os.makedirs(tmp_path / "step_10.orbax-checkpoint-tmp-1717171717")
    assert C.latest_step(str(tmp_path)) == 5


def test_trainer_resume_preserves_natgrad_warmup_position(tmp_path):
    """save() must carry the natgrad warmup step counter: a restored run
    replaying the gamma ramp from t=0 silently diverges from the
    uninterrupted trajectory (round-5 review finding)."""
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.train import Trainer

    rng = np.random.RandomState(1)
    X, Y = rng.randn(32, 2), rng.randn(32, 1)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = M.TGPSpec(Dy=1, Dx=2, M=4, N=32.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1,
                                               quad_points=12), flow=fspec)
    params = M.init_tgp_params(spec, X, X[:4], flow_inits=finits)
    copy = lambda p: jax.tree_util.tree_map(lambda x: np.array(x, copy=True), p)
    mk = lambda: [DataLoader(ArrayDataset(X, Y), 64, seed=0),
                  DataLoader(ArrayDataset(X, Y), 64, shuffle=False)]
    kw = dict(verbose_each=0, natgrad_gamma=0.7, natgrad_warmup=16)

    tr_a = Trainer(spec, copy(params), mk(), Y_std=np.ones(1), S_test=4, seed=3)
    tr_a.train(8, 0.02, "adam", **kw)   # ramp half-way
    tr_a.train(8, 0.02, "adam", **kw)

    tr_b = Trainer(spec, copy(params), mk(), Y_std=np.ones(1), S_test=4, seed=3)
    tr_b.train(8, 0.02, "adam", **kw)
    tr_b.save(str(tmp_path))
    tr_c = Trainer(spec, copy(params), mk(), Y_std=np.ones(1), S_test=4, seed=3)
    tr_c.restore(str(tmp_path))
    tr_c.train(8, 0.02, "adam", **kw)

    for a, b in zip(jax.tree_util.tree_leaves(tr_a.params),
                    jax.tree_util.tree_leaves(tr_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
