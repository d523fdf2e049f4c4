"""cfg.set_rng_impl('rbg') — the TPU-hardware-RNG lever for MC-dropout draws.

The rbg impl changes only the stream bits, not the draw distributions
(benchmarks/id_profile.py measures the 1.33x ID-step payoff on the real
chip); these tests pin the *plumbing*: typed keys must flow through the
Trainer fast path, checkpoint/resume bit-exactly, and vmap through the
multiseed battery kernel.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu import config as cfg


@pytest.fixture
def rbg():
    cfg.set_rng_impl("rbg")
    try:
        yield
    finally:
        cfg.set_rng_impl("threefry2x32")


def _id_problem(N=40, Dx=3, M=5):
    """Tiny MC-dropout ID_TGP: the one model family whose train step draws
    from the rng every epoch (dropout masks)."""
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M_
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    rng = np.random.RandomState(0)
    X, Y = rng.randn(N, Dx), rng.randn(N, 1)
    np.random.seed(0)
    fspec, finits = spec_from_list(
        G.SAL(1, input_dependent=True, input_dim=Dx, num_hidden_layers=1,
              dropout=0.25, hidden_dim=4, hidden_activation="relu",
              inference="MC_dropout"))
    spec = M_.TGPSpec(Dy=1, Dx=Dx, M=M, N=float(N),
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("gaussian_flow", 1,
                                                quad_points=8),
                      flow=fspec)
    params = M_.init_tgp_params(spec, X, X[:M], flow_inits=finits)
    return spec, params, X, Y


def _mk_loaders(X, Y):
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    return [DataLoader(ArrayDataset(X, Y), 64, seed=0),
            DataLoader(ArrayDataset(X, Y), 64, shuffle=False)]


def test_make_rng_impls():
    k = cfg.make_rng(3)
    assert k.dtype == np.uint32 and k.shape == (2,)   # classic raw key
    cfg.set_rng_impl("rbg")
    try:
        k = cfg.make_rng(3)
        assert jax.numpy.issubdtype(k.dtype, jax.dtypes.prng_key)
        jax.random.bernoulli(jax.random.split(k)[0], 0.5, (3,))  # usable
    finally:
        cfg.set_rng_impl("threefry2x32")
    with pytest.raises(ValueError):
        cfg.set_rng_impl("pcg64")


def test_rbg_trainer_runs_and_resumes_bit_exact(rbg, tmp_path):
    from tgp.pytorch_tpu.train import Trainer

    spec, params, X, Y = _id_problem()
    copy = lambda p: jax.tree_util.tree_map(lambda x: np.array(x, copy=True), p)

    tr_a = Trainer(spec, copy(params), _mk_loaders(X, Y), Y_std=np.ones(1),
                   S_test=5, seed=7)
    tr_a.train(10, 0.02, "adam", verbose_each=0)
    assert np.isfinite(float(tr_a.loss_curve[-1]))
    tr_a.train(10, 0.02, "adam", verbose_each=0)

    tr_b = Trainer(spec, copy(params), _mk_loaders(X, Y), Y_std=np.ones(1),
                   S_test=5, seed=7)
    tr_b.train(10, 0.02, "adam", verbose_each=0)
    tr_b.save(str(tmp_path))
    tr_c = Trainer(spec, copy(params), _mk_loaders(X, Y), Y_std=np.ones(1),
                   S_test=5, seed=999)   # restore must overwrite the rng
    tr_c.restore(str(tmp_path))
    assert jax.numpy.issubdtype(tr_c._rng.dtype, jax.dtypes.prng_key)
    tr_c.train(10, 0.02, "adam", verbose_each=0)

    for a, b in zip(jax.tree_util.tree_leaves(tr_a.params),
                    jax.tree_util.tree_leaves(tr_c.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_rbg_differs_from_threefry_but_same_init(tmp_path):
    """Same seed, different impl: identical param init (numpy-side), but the
    dropout streams — and hence the trained params — differ."""
    from tgp.pytorch_tpu.train import Trainer

    spec, params, X, Y = _id_problem()
    copy = lambda p: jax.tree_util.tree_map(lambda x: np.array(x, copy=True), p)

    tr_t = Trainer(spec, copy(params), _mk_loaders(X, Y), Y_std=np.ones(1),
                   S_test=5, seed=7)
    tr_t.train(10, 0.02, "adam", verbose_each=0)
    cfg.set_rng_impl("rbg")
    try:
        tr_r = Trainer(spec, copy(params), _mk_loaders(X, Y),
                       Y_std=np.ones(1), S_test=5, seed=7)
        tr_r.train(10, 0.02, "adam", verbose_each=0)
    finally:
        cfg.set_rng_impl("threefry2x32")
    assert np.isfinite(float(tr_r.loss_curve[-1]))
    la = np.asarray(tr_t.loss_curve, dtype=np.float64)
    lb = np.asarray(tr_r.loss_curve, dtype=np.float64)
    assert not np.allclose(la, lb)      # different stream bits
    assert abs(la[-1] - lb[-1]) < 0.2 * abs(la[-1]) + 10.0  # same trajectory class


def test_rbg_multiseed_battery(rbg):
    from tgp.pytorch_tpu.train.multiseed import train_multiseed

    spec, params, X, Y = _id_problem()
    R = 3
    stack = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x), (R,) + np.shape(x)).copy(),
        params)
    Xs = np.broadcast_to(X, (R,) + X.shape).copy()
    Ys = np.broadcast_to(Y, (R,) + Y.shape).copy()
    params_stack, curves = train_multiseed(spec, stack, Xs, Ys, epochs=5,
                                           lr=0.02, seed=11)
    assert np.isfinite(np.asarray(curves["elbo"])).all()
    for l in jax.tree_util.tree_leaves(params_stack):
        a = np.asarray(l)
        if a.dtype.kind == "f":
            assert np.isfinite(a).all()


def test_rbg_multiseed_battery_on_mesh(rbg):
    """ADVICE r3: the rbg + --mesh combination — TYPED key arrays flowing
    through _pad_for_mesh's jnp.concatenate (R=3 padded to dp=8) and
    _shard_replica_axis's sharded device_put — pinned against regression,
    and the padded-clone outputs must match the unsharded run replica-for-
    replica (padding clones are sliced back out)."""
    from tgp.pytorch_tpu.train.multiseed import train_multiseed
    from tgp.pytorch_tpu.parallel.mesh import make_mesh

    spec, params, X, Y = _id_problem()
    R = 3   # deliberately non-divisible into dp=8 -> exercises the pad
    stack = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x), (R,) + np.shape(x)).copy(),
        params)
    Xs = np.broadcast_to(X, (R,) + X.shape).copy()
    Ys = np.broadcast_to(Y, (R,) + Y.shape).copy()

    p_ref, c_ref = train_multiseed(spec, jax.tree_util.tree_map(jnp.copy, stack),
                                   Xs, Ys, epochs=5, lr=0.02, seed=11)
    mesh = make_mesh(dp=8, ty=1)
    p_sh, c_sh = train_multiseed(spec, stack, Xs, Ys, epochs=5, lr=0.02,
                                 seed=11, mesh=mesh)
    np.testing.assert_allclose(np.asarray(c_sh["elbo"]),
                               np.asarray(c_ref["elbo"]), rtol=1e-6)
    assert np.asarray(c_sh["elbo"]).shape[1] == R  # pad sliced back out
    for a, b in zip(jax.tree_util.tree_leaves(p_sh),
                    jax.tree_util.tree_leaves(p_ref)):
        a, b = np.asarray(a), np.asarray(b)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
