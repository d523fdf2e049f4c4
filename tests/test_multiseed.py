"""Vectorized multi-seed batteries must be EXACTLY R independent runs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tgp.pytorch_tpu import config as cfg
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as Mm
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.train import multiseed as ms


def _make_replica(r, N=64, Dy=1, M=6):
    rng = np.random.RandomState(100 + r)
    X = np.asarray(rng.randn(N, 2), np.float32)
    W = rng.randn(2, Dy)
    Y = np.asarray(np.sinh(X @ W) + 0.1 * rng.randn(N, Dy), np.float32)
    return X, Y


def _spec(Dy=1, M=6):
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = Mm.TGPSpec(Dy=Dy, Dx=2, M=M, N=64.0,
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("gaussian_flow", Dy,
                                                quad_points=10),
                      flow=fspec)
    return spec, finits


def _init(spec, finits, X, M):
    return Mm.init_tgp_params(
        spec, X, X[:M].copy(), variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=finits)


def _single_run(spec, params, X, Y, epochs, lr, seed_key):
    """The exact per-replica program train_multiseed claims to implement."""
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)

    @jax.jit
    def run(p, s, key):
        def body(carry, _):
            p, s, key = carry
            key, sub = jax.random.split(key)
            g = jax.grad(lambda pp: -Mm.elbo(spec, pp, Xd, Yd, sub)[0])(p)
            u, s = optimizer.update(g, s, p)
            return (optax.apply_updates(p, u), s, key), ()
        (p, s, key), _ = jax.lax.scan(body, (p, s, key), None, length=epochs)
        return p

    return run(params, opt_state, seed_key)


def test_battery_equals_independent_runs():
    R, M, epochs = 3, 6, 30
    spec, finits = _spec(M=M)
    Xs, Ys, ps = [], [], []
    for r in range(R):
        X, Y = _make_replica(r)
        Xs.append(X)
        Ys.append(Y)
        ps.append(_init(spec, finits, X, M))
    stack = ms.stack_trees(ps)
    out, curves = ms.train_multiseed(
        spec, stack, np.stack(Xs), np.stack(Ys), epochs, 0.01, seed=5)
    assert curves["elbo"].shape == (epochs, R)
    for r in range(R):
        ref = _single_run(spec, ps[r], Xs[r], Ys[r], epochs, 0.01,
                          jax.random.PRNGKey(5 + r))
        got = ms.unstack_tree(out, r)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def test_battery_eval_and_clip():
    R, M, epochs = 2, 6, 20
    spec, finits = _spec(M=M)
    Xs, Ys, ps = [], [], []
    for r in range(R):
        X, Y = _make_replica(r)
        Xs.append(X)
        Ys.append(Y)
        ps.append(_init(spec, finits, X, M))
    stack = ms.stack_trees(ps)
    out, _ = ms.train_multiseed(
        spec, stack, np.stack(Xs), np.stack(Ys), epochs, 0.01, seed=5,
        clip_norm=100.0)
    metrics = ms.eval_multiseed(spec, out, np.stack(Xs), np.stack(Ys),
                                np.ones((R, 1)), S_test=50)
    assert metrics["logL"].shape == (R, 1)
    assert metrics["rmse"].shape == (R, 1)
    assert np.isfinite(metrics["logL"]).all()
    assert (metrics["coverage"] >= 0).all() and (metrics["coverage"] <= 1).all()
    # per-replica eval must equal evaluating each replica alone
    one = ms.eval_multiseed(spec, ms.stack_trees([ms.unstack_tree(out, 1)]),
                            Xs[1][None], Ys[1][None], np.ones((1, 1)),
                            S_test=50)
    np.testing.assert_allclose(one["rmse"][0], metrics["rmse"][1], rtol=1e-5)


def test_per_replica_clip_matches_optax_per_model():
    tx = ms.clip_by_global_norm_per_replica(0.5)
    g1 = {"a": jnp.asarray([[3.0, 4.0]]), "b": jnp.asarray([[0.0]])}   # norm 5
    g2 = {"a": jnp.asarray([[0.1, 0.0]]), "b": jnp.asarray([[0.2]])}   # small
    stacked = jax.tree_util.tree_map(lambda *l: jnp.concatenate(l), g1, g2)
    got, _ = tx.update(stacked, ())
    ref1, _ = optax.clip_by_global_norm(0.5).update(
        jax.tree_util.tree_map(lambda l: l[0], g1), optax.EmptyState())
    np.testing.assert_allclose(got["a"][0], ref1["a"], rtol=1e-6)
    # the small replica is untouched
    np.testing.assert_allclose(got["a"][1], g2["a"][0], rtol=1e-6)


def test_battery_sharded_over_seed_axis_matches():
    """mesh= shards the replica axis over 'dp': same results as unsharded
    (replicas are independent — sharding must be a pure placement change)."""
    from tgp.pytorch_tpu.parallel.mesh import make_mesh
    spec, finits = _spec()
    R, M = 8, 6
    data = [_make_replica(r) for r in range(R)]
    stack = ms.stack_trees([_init(spec, finits, X, M) for X, _ in data])
    Xs = np.stack([d[0] for d in data])
    Ys = np.stack([d[1] for d in data])

    p_ref, c_ref = ms.train_multiseed(spec, stack, Xs, Ys, epochs=25, lr=0.05)

    stack2 = ms.stack_trees([_init(spec, finits, X, M) for X, _ in data])
    mesh = make_mesh(dp=8, ty=1)
    p_sh, c_sh = ms.train_multiseed(spec, stack2, Xs, Ys, epochs=25, lr=0.05,
                                    mesh=mesh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6),
        p_ref, p_sh)
    np.testing.assert_allclose(c_ref["elbo"], c_sh["elbo"], rtol=2e-5,
                               atol=1e-5)

    # sharded eval matches unsharded too
    Ystd = np.ones((R, 1), np.float32)
    m_ref = ms.eval_multiseed(spec, p_ref, Xs, Ys, Ystd, S_test=20)
    m_sh = ms.eval_multiseed(spec, p_sh, Xs, Ys, Ystd, S_test=20, mesh=mesh)
    np.testing.assert_allclose(m_ref["logL"], m_sh["logL"], rtol=2e-5,
                               atol=1e-5)


def test_split_call_carry_bit_identical():
    """train(60) == train(30) -> carry -> train(30): optimizer moments and
    rng streams continue across the call boundary (torch
    keep_parameter_groups semantics for multi-phase battery protocols)."""
    spec, finits = _spec()
    R, M = 2, 6
    data = [_make_replica(r) for r in range(R)]
    Xs = np.stack([d[0] for d in data])
    Ys = np.stack([d[1] for d in data])

    stack_a = ms.stack_trees([_init(spec, finits, X, M) for X, _ in data])
    p_once, c_once, _ = ms.train_multiseed(
        spec, stack_a, Xs, Ys, epochs=60, lr=0.05, return_state=True)

    stack_b = ms.stack_trees([_init(spec, finits, X, M) for X, _ in data])
    p1, c1, st = ms.train_multiseed(
        spec, stack_b, Xs, Ys, epochs=30, lr=0.05, return_state=True)
    p2, c2, _ = ms.train_multiseed(
        spec, p1, Xs, Ys, epochs=30, lr=0.05, carry=st, return_state=True)

    for a, b in zip(jax.tree_util.tree_leaves(p_once),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        c_once["elbo"], np.concatenate([c1["elbo"], c2["elbo"]], axis=0))

    # the Adam family shares one (count, mu, nu) state layout, so a kind
    # switch must raise rather than reinterpret moments (ADVICE r2)
    with pytest.raises(ValueError, match="opt_kind"):
        ms.train_multiseed(spec, p2, Xs, Ys, epochs=1, lr=0.05,
                           opt="adam_W", carry=st)
    with pytest.raises(ValueError, match="clip_norm"):
        ms.train_multiseed(spec, p2, Xs, Ys, epochs=1, lr=0.05,
                           clip_norm=1.0, carry=st)


def test_bn_battery_finalizes_stats_per_replica():
    """Battery pipelines must recalibrate BN statistics before eval —
    finalize composes with unstack/stack and changes eval outputs."""
    from tgp.pytorch_tpu.models import tgp as Mm2
    R = 2
    rng = np.random.RandomState(7)
    Xs = np.stack([rng.randn(40, 3) + 3.0 * r for r in range(R)])
    Ys = np.stack([rng.randn(40, 1) for _ in range(R)])
    flow_list = G.SAL(1, input_dependent=True, input_dim=3,
                      batch_norm=1, dropout=0.0, hidden_dim=8,
                      hidden_activation="relu", num_hidden_layers=1,
                      inference="MC_dropout")
    fspec, finits = spec_from_list(flow_list)
    spec = Mm2.TGPSpec(Dy=1, Dx=3, M=5, N=40.0,
                       kernel=K.from_name("scale_rbf"),
                       likelihood=LikelihoodSpec("gaussian_flow", 1,
                                                 quad_points=8),
                       flow=fspec)
    assert spec.has_bn_flow
    ps = [Mm2.init_tgp_params(spec, Xs[r], Xs[r][:5].copy(),
                              flow_inits=finits) for r in range(R)]
    stack = ms.stack_trees(ps)
    stack, _ = ms.train_multiseed(spec, stack, Xs, Ys, epochs=5, lr=0.01)

    m_raw = ms.eval_multiseed(spec, stack, Xs, Ys, np.ones((R, 1)), S_test=8)
    fin = ms.stack_trees([
        Mm2.finalize_batch_norm(spec, ms.unstack_tree(stack, r), Xs[r])
        for r in range(R)])
    m_fin = ms.eval_multiseed(spec, fin, Xs, Ys, np.ones((R, 1)), S_test=8)
    # replicas see shifted inputs, so recalibrated stats change the scores
    assert not np.allclose(m_raw["logL"], m_fin["logL"])
    assert np.isfinite(m_fin["logL"]).all()


def test_battery_mesh_pads_non_divisible_replicas():
    """R=5 on a dp=8 mesh: _pad_for_mesh clones the last replica so
    device_put accepts the sharding, and every output slices back to R=5
    — bit-matching the unsharded run (the reference's canonical R=10
    battery on an 8-chip mesh is this case)."""
    from tgp.pytorch_tpu.parallel.mesh import make_mesh
    spec, finits = _spec()
    R, M = 5, 6
    data = [_make_replica(r) for r in range(R)]
    stack = ms.stack_trees([_init(spec, finits, X, M) for X, _ in data])
    Xs = np.stack([d[0] for d in data])
    Ys = np.stack([d[1] for d in data])

    p_ref, c_ref = ms.train_multiseed(spec, stack, Xs, Ys, epochs=20, lr=0.05)

    stack2 = ms.stack_trees([_init(spec, finits, X, M) for X, _ in data])
    mesh = make_mesh(dp=8, ty=1)
    p_sh, c_sh, state = ms.train_multiseed(spec, stack2, Xs, Ys, epochs=20,
                                           lr=0.05, mesh=mesh,
                                           return_state=True)
    assert c_sh["elbo"].shape == (20, R)
    jax.tree_util.tree_map(
        lambda a, b: (np.testing.assert_equal(np.shape(a), np.shape(b)),
                      np.testing.assert_allclose(np.asarray(a),
                                                 np.asarray(b),
                                                 rtol=2e-5, atol=1e-6)),
        p_ref, p_sh)
    np.testing.assert_allclose(c_ref["elbo"], c_sh["elbo"], rtol=2e-5,
                               atol=1e-5)
    assert np.asarray(state["rngs"]).shape[0] == R

    # eval pads/slices the same way
    Ystd = np.ones((R, 1), np.float32)
    m_ref = ms.eval_multiseed(spec, p_ref, Xs, Ys, Ystd, S_test=20)
    m_sh = ms.eval_multiseed(spec, p_sh, Xs, Ys, Ystd, S_test=20, mesh=mesh)
    assert m_sh["logL"].shape == m_ref["logL"].shape
    np.testing.assert_allclose(m_ref["logL"], m_sh["logL"], rtol=2e-5,
                               atol=1e-5)

    # minibatch path (MB < N) pads the per-chunk permutations too
    p_mb, c_mb = ms.train_multiseed_minibatch(spec, ms.stack_trees(
        [_init(spec, finits, X, M) for X, _ in data]), Xs, Ys, epochs=8,
        lr=0.05, batch_size=32)
    p_mb2, c_mb2 = ms.train_multiseed_minibatch(spec, ms.stack_trees(
        [_init(spec, finits, X, M) for X, _ in data]), Xs, Ys, epochs=8,
        lr=0.05, batch_size=32, mesh=mesh)
    assert c_mb2["elbo"].shape == c_mb["elbo"].shape
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                rtol=2e-5, atol=1e-6),
        p_mb, p_mb2)


def test_battery_natgrad_conjugate_exact_per_replica():
    """train_multiseed(natgrad_gamma=1.0) applies the vmapped fused NGD
    step per replica: on conjugate SVGP replicas with hypers held (lr=0
    via an empty-match spec is not available, so use a tiny lr and check
    the q fixed point dominates), consecutive epochs reach a per-replica
    q(U) fixed point: epoch 1 jumps, epoch 2 matches epoch 1 closely, and
    q(U) left the gradient optimizer (Adam moments for q are inactive)."""
    R, M = 3, 6
    spec = Mm.svgp_spec(Dy=1, Dx=2, M=M, N=64.0,
                        kernel=K.from_name("scale_rbf"),
                        likelihood=LikelihoodSpec("gaussian", 1))
    Xs, Ys, Ps = [], [], []
    for r in range(R):
        X, Y = _make_replica(r)
        Xs.append(X); Ys.append(Y)
        Ps.append(Mm.init_tgp_params(
            spec, X, X[:M].copy(), variance_scale=1e-5,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
            noise_init=0.05))
    stack = ms.stack_trees(Ps)
    p1, c1 = ms.train_multiseed(spec, stack, np.stack(Xs), np.stack(Ys),
                                3, 1e-12, natgrad_gamma=1.0)
    e = np.asarray(c1["elbo"])
    assert np.isfinite(e).all()
    # the first NGD step is the big jump; after it q is optimal per
    # replica so later epochs are (near-)fixed points
    assert (e[2] - e[1] < 1e-3).all() and (np.abs(e[2] - e[1]) < 1e-2).all()
    assert (e[1] > e[0] - 1e-6).all()
