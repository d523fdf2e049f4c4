"""Minibatch-SVI batteries must be exactly R independent minibatch runs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as Mm
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.train import multiseed as ms


def _make_replica(r, N=48, Dy=1):
    rng = np.random.RandomState(200 + r)
    X = np.asarray(rng.randn(N, 2), np.float32)
    W = rng.randn(2, Dy)
    Y = np.asarray(np.sinh(X @ W) + 0.1 * rng.randn(N, Dy), np.float32)
    return X, Y


def _spec(N, Dy=1, M=5):
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = Mm.TGPSpec(Dy=Dy, Dx=2, M=M, N=float(N),
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("gaussian_flow", Dy,
                                                quad_points=8),
                      flow=fspec)
    return spec, finits


def _single_minibatch_run(spec, params, X, Y, epochs, lr, MB, key, perm_gen):
    """Replica-wise program train_multiseed_minibatch claims to implement:
    scan over full batches + one remainder step per epoch, same generator."""
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    N = X.shape[0]
    n_batches, rem = N // MB, N % MB

    @jax.jit
    def step(p, s, key, xb, yb):
        key, sub = jax.random.split(key)
        g = jax.grad(lambda pp: -Mm.elbo(spec, pp, xb, yb, sub)[0])(p)
        u, s = optimizer.update(g, s, p)
        return optax.apply_updates(p, u), s, key

    for _ in range(epochs):
        perm = perm_gen.permutation(N)
        for b in range(n_batches):
            ids = perm[b * MB:(b + 1) * MB]
            params, opt_state, key = step(params, opt_state, key,
                                          Xd[ids], Yd[ids])
        if rem:
            ids = perm[n_batches * MB:]
            params, opt_state, key = step(params, opt_state, key,
                                          Xd[ids], Yd[ids])
    return params


def test_minibatch_battery_equals_independent_runs():
    R, M, MB, epochs, seed = 2, 5, 20, 6, 11
    N = 48                                 # 2 full batches + remainder of 8
    spec, finits = _spec(N, M=M)
    Xs, Ys, ps = [], [], []
    for r in range(R):
        X, Y = _make_replica(r, N=N)
        Xs.append(X)
        Ys.append(Y)
        ps.append(Mm.init_tgp_params(
            spec, X, X[:M].copy(), variance_scale=1e-5,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
            noise_init=0.05, flow_inits=finits))
    out, curves = ms.train_multiseed_minibatch(
        spec, ms.stack_trees(ps), np.stack(Xs), np.stack(Ys), epochs,
        0.01, batch_size=MB, seed=seed)
    assert curves["elbo"].shape == (epochs, R)
    for r in range(R):
        gen = np.random.Generator(np.random.PCG64(seed + 7919 * (r + 1)))
        ref = _single_minibatch_run(spec, ps[r], Xs[r], Ys[r], epochs, 0.01,
                                    MB, jax.random.PRNGKey(seed + r), gen)
        got = ms.unstack_tree(out, r)
        for a, b in zip(jax.tree_util.tree_leaves(got),
                        jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=2e-6)


def test_minibatch_battery_full_batch_fallback():
    R, M, epochs = 2, 5, 5
    N = 48
    spec, finits = _spec(N, M=M)
    Xs, Ys, ps = [], [], []
    for r in range(R):
        X, Y = _make_replica(r, N=N)
        Xs.append(X)
        Ys.append(Y)
        ps.append(Mm.init_tgp_params(
            spec, X, X[:M].copy(), variance_scale=1e-5,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
            noise_init=0.05, flow_inits=finits))
    out_a, _ = ms.train_multiseed_minibatch(
        spec, ms.stack_trees(ps), np.stack(Xs), np.stack(Ys), epochs,
        0.01, batch_size=10 ** 6, seed=3)
    out_b, _ = ms.train_multiseed(
        spec, ms.stack_trees(ps), np.stack(Xs), np.stack(Ys), epochs,
        0.01, seed=3)
    for a, b in zip(jax.tree_util.tree_leaves(out_a),
                    jax.tree_util.tree_leaves(out_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_minibatch_battery_sharded_matches():
    """mesh= on the minibatch battery: pure placement change."""
    from tgp.pytorch_tpu.parallel.mesh import make_mesh
    R, M, MB, epochs, seed = 4, 5, 20, 6, 11
    N = 48
    spec, finits = _spec(N, M=M)
    Xs, Ys, ps = [], [], []
    for r in range(R):
        X, Y = _make_replica(r, N=N)
        Xs.append(X)
        Ys.append(Y)
        ps.append(Mm.init_tgp_params(
            spec, X, X[:M].copy(), variance_scale=1e-5,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
            noise_init=0.05, flow_inits=finits))

    p_ref, c_ref = ms.train_multiseed_minibatch(
        spec, ms.stack_trees(ps), np.stack(Xs), np.stack(Ys), epochs,
        0.01, batch_size=MB, seed=seed)

    mesh = make_mesh(dp=4, ty=2)
    p_sh, c_sh = ms.train_multiseed_minibatch(
        spec, ms.stack_trees(ps), np.stack(Xs), np.stack(Ys), epochs,
        0.01, batch_size=MB, seed=seed, mesh=mesh)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6),
        p_ref, p_sh)
    np.testing.assert_allclose(c_ref["elbo"], c_sh["elbo"], rtol=2e-5,
                               atol=1e-5)


def test_minibatch_split_call_carry_bit_identical():
    """Same split-call invariant on the minibatch path (shuffle generator
    positions carry too)."""
    from tgp.pytorch_tpu.train import multiseed as ms
    R, M, MB, seed = 2, 5, 20, 11
    N = 48
    spec, finits = _spec(N, M=M)
    Xs, Ys, ps = [], [], []
    for r in range(R):
        X, Y = _make_replica(r, N=N)
        Xs.append(X)
        Ys.append(Y)
        ps.append(Mm.init_tgp_params(
            spec, X, X[:M].copy(), variance_scale=1e-5,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
            noise_init=0.05, flow_inits=finits))
    Xs, Ys = np.stack(Xs), np.stack(Ys)

    p_once, c_once, _ = ms.train_multiseed_minibatch(
        spec, ms.stack_trees(ps), Xs, Ys, 8, 0.01, batch_size=MB,
        seed=seed, return_state=True)
    p1, c1, st = ms.train_multiseed_minibatch(
        spec, ms.stack_trees(ps), Xs, Ys, 4, 0.01, batch_size=MB,
        seed=seed, return_state=True)
    p2, c2, _ = ms.train_multiseed_minibatch(
        spec, p1, Xs, Ys, 4, 0.01, batch_size=MB, seed=seed, carry=st,
        return_state=True)
    for a, b in zip(jax.tree_util.tree_leaves(p_once),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        c_once["elbo"], np.concatenate([c1["elbo"], c2["elbo"]], axis=0))
