"""Vectorized multi-seed batteries: R independent replicas in ONE program.

The reference's experimental protocol runs every (dataset, model) cell as
10 serial process launches, one per train/test split seed
(bash_scripts/launch_test_uci_medium-small_regression.sh: `for split in
1..10`).  On TPU that is wasteful twice over: each launch recompiles, and
at paper scales a single training step is latency-bound, not FLOP-bound
(PARITY.md roofline: 1.24 GFLOP/step for power M=100 — a fraction of what
the MXU streams in the same 567 us).  Here the seed axis becomes a vmap
axis: R replicas — each with its own split's data, z-scoring, k-means
inducing init and parameters — advance inside one jitted scan, at close
to the step cost of ONE model.

Semantics: identical to running R separate Trainers on the full-batch
scan path.  Adam on the stacked pytree IS per-replica Adam (every moment
update is elementwise, nothing couples the leading axis); tested
one-to-one in tests/test_multiseed.py.

Different seeds see different splits, so X/Y/Y_std all carry the leading
R axis; parameters are stacked with `stack_trees`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as cfg
from ..models import tgp as tgp_mod


def stack_trees(trees):
    """Stack a list of identically-structured pytrees on a new leading axis."""
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *trees)


def unstack_tree(tree, r):
    """Replica r of a stacked pytree."""
    return jax.tree_util.tree_map(lambda l: l[r], tree)


def clip_by_global_norm_per_replica(max_norm: float):
    """optax.clip_by_global_norm applied independently to each replica's
    slice of the stacked pytree (a plain global-norm clip would couple the
    replicas through one shared norm)."""

    def init(params):
        return ()

    def update(updates, state, params=None):
        sq = jax.tree_util.tree_reduce(
            lambda acc, u: acc + jnp.sum(
                jnp.square(u), axis=tuple(range(1, u.ndim))),
            updates, jnp.zeros(()))
        norm = jnp.sqrt(sq)                                  # (R,)
        scale = jnp.where(norm < max_norm, 1.0, max_norm / norm)
        updates = jax.tree_util.tree_map(
            lambda u: u * scale.reshape(scale.shape + (1,) * (u.ndim - 1)),
            updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def _optimizer(spec, params_stack, opt: str, lr: float, clip_norm,
               specs=None, force_grouped=False, extra_frozen=None):
    """Optimizer for the stacked pytree.  Parameter-group specs and frozen
    labels are PATH-based and every transform is elementwise, so the
    single-model machinery applies to the stacked tree verbatim and equals
    per-replica groups.

    For the Adam family with groups (or when force_grouped, for cross-call
    state carry) this uses the per-leaf grouped implementation
    (train/group_adam.py) — the same torch `add_param_group` semantics the
    Trainer has, so multi-phase battery protocols (hold-kernel) carry
    moments for pre-existing groups exactly like the reference."""
    from .optimizers import make_optimizer, build_grouped_optimizer
    from .trainer import frozen_param_labels
    frozen = frozen_param_labels(spec, params_stack)
    if extra_frozen is not None:
        frozen = jax.tree_util.tree_map(lambda a, b: bool(a) or bool(b),
                                        frozen, extra_frozen)
    any_frozen = any(jax.tree_util.tree_leaves(frozen))
    grouped = specs is not None or any_frozen
    if opt in ("adam", "adam_W", "adam_R") and (grouped or force_grouped):
        from . import group_adam as GA
        lr_t, wd_t, act_t = GA.annotations_from_specs(
            params_stack, specs, lr, frozen_labels=frozen,
            default_wd=0.01 if opt == "adam_W" else 0.0)

        def update_fn(grads, state, params=None):
            return GA.update(grads, state, params, lr_t, wd_t, act_t,
                             kind=opt)

        tx = optax.GradientTransformation(GA.init_state, update_fn)
    elif grouped:
        tx, _ = build_grouped_optimizer(params_stack, specs or [], lr, opt,
                                        frozen)
    else:
        tx = make_optimizer(opt, lr)
    if clip_norm is not None:
        tx = optax.chain(clip_by_global_norm_per_replica(clip_norm), tx)
    return tx


def _pad_for_mesh(mesh, R, *trees):
    """(R_pad, trees') — append copies of the LAST replica to every leaf
    with leading axis R so the replica count divides the mesh 'dp' axis.

    device_put with a NamedSharding refuses non-divisible leading axes, and
    the reference's canonical battery is R=10 seeds — on an 8-chip dp mesh
    exactly the non-divisible case.  Padding clones the last replica's
    params, data AND rng stream, so the padded trajectories are
    bit-identical to it; callers slice every output back to the caller's R
    (curves, states, metrics), making the pad invisible."""
    pad = 0 if mesh is None else (-R) % int(mesh.shape.get("dp", 1))
    if pad == 0:
        return R, trees

    def pad_leaf(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == R:
            return jnp.concatenate([x] + [x[-1:]] * pad, axis=0)
        return x

    return R + pad, tuple(jax.tree_util.tree_map(pad_leaf, t) for t in trees)


def _slice_replicas(R_pad, R_out, *trees):
    """Undo `_pad_for_mesh`: slice every leaf with leading axis R_pad back
    to the caller's R_out replicas (identity when no padding happened)."""
    if R_pad == R_out:
        return trees if len(trees) > 1 else trees[0]

    def cut(x):
        return x[:R_out] if (hasattr(x, "ndim") and x.ndim >= 1
                             and x.shape[0] == R_pad) else x

    out = tuple(jax.tree_util.tree_map(cut, t) for t in trees)
    return out if len(out) > 1 else out[0]


def _host_rngs(rngs):
    """Carry-friendly host view of the rng stack: raw uint32 keys fetch to
    numpy (round-2 behaviour); typed keys (cfg.set_rng_impl('rbg')) stay
    jax arrays — np.asarray cannot represent the key dtype."""
    return (rngs if jnp.issubdtype(rngs.dtype, jax.dtypes.prng_key)
            else np.asarray(rngs))


def _shard_replica_axis(mesh, R, *trees):
    """device_put each tree with its leading R (replica) axis on 'dp';
    leaves without one (scalar step counts, shared constants) replicate."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put_leaf(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == R:
            sh = NamedSharding(mesh, P("dp", *([None] * (x.ndim - 1))))
        else:
            sh = NamedSharding(mesh, P())
        return jax.device_put(x, sh)

    out = tuple(jax.tree_util.tree_map(put_leaf, t) for t in trees)
    return out if len(out) > 1 else out[0]


def _resolve_carry(optimizer, params_stack, carry, R, seed, opt=None,
                   clip_norm=None):
    """(opt_state, rngs) for a battery call: fresh, or carried from a
    previous call's return_state=True result (torch keep_parameter_groups
    semantics across protocol phases — reference trainer_base.py:271-318).

    Structure alone cannot distinguish the Adam family (adam/adam_W/adam_R
    share the (count, mu, nu) layout), so the carry also records the
    optimizer kind and clip setting; a mismatch raises rather than silently
    reinterpreting moments under a different update rule (the Trainer
    resets on a kind switch for the same reason)."""
    opt_state = optimizer.init(params_stack)
    if carry is None:
        rngs = jax.vmap(cfg.make_rng)(seed + jnp.arange(R))
        return opt_state, rngs
    for key, want in (("opt_kind", opt), ("clip_norm", clip_norm)):
        if key in carry and carry[key] != want:
            raise ValueError(
                f"carried optimizer state was produced with "
                f"{key}={carry[key]!r} but this call uses {want!r} — "
                "use the same opt/clip_norm in every phase, or pass "
                "carry=None to reset moments deliberately")
    cs = carry["opt_state"]
    if (jax.tree_util.tree_structure(cs)
            != jax.tree_util.tree_structure(opt_state)):
        raise ValueError(
            "carried optimizer state does not match this call's optimizer "
            "structure — use the same opt/clip_norm in every phase (the "
            "grouped Adam family keeps a spec-independent state layout)")
    return cs, jnp.asarray(carry["rngs"])


def _check_replica_axis(params_stack, R):
    """Every leaf must be replica-stacked (leading axis R, as `stack_trees`
    produces): the mesh pad/slice/shard helpers identify replica leaves
    purely by shape[0] == R and would silently pad/truncate a leaf whose
    leading dim coincidentally equals R without being replica-stacked.
    A real error, not an assert — `python -O` must not restore the hazard."""
    for leaf in jax.tree_util.tree_leaves(params_stack):
        if jnp.ndim(leaf) < 1 or jnp.shape(leaf)[0] != R:
            raise ValueError(
                f"params_stack leaf shape {jnp.shape(leaf)} lacks the "
                f"leading replica axis R={R}; build stacks with stack_trees")


def _natgrad_extras(params_stack, natgrad_gamma):
    """(extra_frozen, want_ng): q(U) leaves leave the gradient optimizer
    when natural-gradient VI is on (see train/natgrad.py)."""
    if natgrad_gamma is None:
        return None, False
    if natgrad_gamma <= 0.0:
        raise ValueError(
            f"natgrad_gamma must be > 0 (got {natgrad_gamma}); gamma=0 "
            "would freeze q(U) out of BOTH optimizers — pass None to train "
            "q(U) with the gradient optimizer")
    from .optimizers import param_paths
    paths = param_paths(params_stack)
    extra = jax.tree_util.tree_map(
        lambda q: q.endswith("q_mu") or q.endswith("q_L"), paths)
    return extra, True


def train_multiseed(spec, params_stack, X_stack, Y_stack, epochs: int,
                    lr: float, opt: str = "adam", seed: int = 0,
                    chunk: int = 2000, clip_norm=None, verbose_each: int = 0,
                    specs=None, mesh=None, carry=None,
                    return_state: bool = False, natgrad_gamma=None,
                    natgrad_warmup=None, natgrad_force: bool = False):
    """Train R replicas full-batch for `epochs` steps, vmapped.

    Args:
      params_stack: pytree with leading R axis (see `stack_trees`), one
        replica per split seed.
      X_stack: (R, N, Dx); Y_stack: (R, N, Dy) float or (R, N) int labels.
      mesh: optional jax.sharding.Mesh with a 'dp' axis: the replica axis
        is sharded across it — seeds are independent programs, so the whole
        10-seed protocol scales embarrassingly across chips (the only
        collective XLA inserts is the scalar loss-sum psum).  R need not
        divide the axis (GSPMD pads), but divisible R wastes nothing.
      carry / return_state: multi-phase protocols (hold-kernel) pass the
        previous phase's returned state dict here so optimizer moments and
        rng streams continue across the boundary exactly like the
        Trainer/reference; splitting one run into two carried calls is
        bit-identical to the uninterrupted run.
    Returns (params_stack, curves[, state]) with curves = dict of
    (epochs, R) arrays (elbo/ell/kld), matching the Trainer's loss_curve
    semantics.

    NOTE: the jitted chunk donates params_stack and opt_state
    (donate_argnums), so the CALLER'S input device buffers are invalidated
    by the first chunk — keep using the returned stack, and jnp.copy()
    first if the input must stay live (tools/pallas_battery_ab.py does).

    INVARIANT: every leaf of params_stack must be replica-stacked (leading
    axis R, as `stack_trees` produces) — the mesh pad/slice/shard helpers
    identify replica leaves purely by `shape[0] == R` and would silently
    pad/truncate a leaf whose leading dim coincidentally equals R without
    being replica-stacked.  Checked (ValueError) below.
    """
    R = X_stack.shape[0]
    _check_replica_axis(params_stack, R)
    dtype = cfg.default_dtype()
    Xd = jnp.asarray(X_stack, dtype)
    Yd = jnp.asarray(Y_stack) if jnp.issubdtype(
        jnp.asarray(Y_stack).dtype, jnp.integer) else jnp.asarray(Y_stack, dtype)
    ng_frozen, use_ng = _natgrad_extras(params_stack, natgrad_gamma)
    if use_ng:
        from .natgrad import guard_step_arch
        guard_step_arch(spec, natgrad_gamma, force=natgrad_force)
    optimizer = _optimizer(spec, params_stack, opt, lr, clip_norm, specs,
                           force_grouped=carry is not None or return_state,
                           extra_frozen=ng_frozen)
    # one rng stream per replica, matching a per-replica Trainer(seed=seed+r)
    opt_state, rngs = _resolve_carry(optimizer, params_stack, carry, R,
                                     seed, opt=opt, clip_norm=clip_norm)
    R_out = R
    if mesh is not None:
        R, (params_stack, opt_state, Xd, Yd, rngs) = _pad_for_mesh(
            mesh, R, params_stack, opt_state, Xd, Yd, rngs)
        params_stack, opt_state, Xd, Yd, rngs = _shard_replica_axis(
            mesh, R, params_stack, opt_state, Xd, Yd, rngs)

    ng_step = None
    if use_ng:
        from .natgrad import natgrad_multiseed_step
        ng_step = natgrad_multiseed_step(spec, optimizer, natgrad_gamma)
    if natgrad_warmup is not None and not use_ng:
        raise ValueError("natgrad_warmup needs natgrad_gamma")
    # warmup ramp continuity across carried calls rides the state dict
    ng_t = int(carry.get("ng_t", 0)) if isinstance(carry, dict) else 0

    @partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
    def run(params, opt_state, Xd, Yd, rngs, n_steps, gammas=None):
        def body(carry, g):
            p, s, keys = carry
            split = jax.vmap(jax.random.split)(keys)       # (R, 2, 2)
            keys, sub = split[:, 0], split[:, 1]
            if ng_step is not None:
                p, s, (e, ell, kld) = ng_step(p, s, Xd, Yd, sub, g)
                return (p, s, keys), (e, ell, kld)

            def loss_fn(pp):
                e, ell, kld = jax.vmap(
                    lambda pr, xr, yr, rr: tgp_mod.elbo(spec, pr, xr, yr, rr)
                )(pp, Xd, Yd, sub)
                # sum over replicas: gradients stay per-replica (independent
                # terms), adam on the stacked pytree is per-replica adam
                return -jnp.sum(e), (e, ell, kld)

            (_, (e, ell, kld)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p)
            updates, s = optimizer.update(grads, s, p)
            p = optax.apply_updates(p, updates)
            return (p, s, keys), (e, ell, kld)

        (params, opt_state, rngs), curves = jax.lax.scan(
            body, (params, opt_state, rngs), gammas, length=n_steps)
        return params, opt_state, rngs, curves

    curves_all = {"elbo": [], "ell": [], "kld": []}
    # the verbose cadence is printed from the fetched per-epoch curves —
    # shrinking the device program to verbose_each would re-pay the ~30 ms
    # tunnel dispatch per cadence tick for nothing
    done = 0
    while done < epochs:
        n = min(chunk, epochs - done)
        gs = None
        if natgrad_warmup is not None:
            from .natgrad import gamma_at
            gs = jnp.asarray(gamma_at(natgrad_gamma, natgrad_warmup,
                                      np.arange(ng_t, ng_t + n)), dtype)
            ng_t += n
        params_stack, opt_state, rngs, (e, ell, kld) = run(
            params_stack, opt_state, Xd, Yd, rngs, n, gs)
        prev = done
        done += n
        curves_all["elbo"].append(np.asarray(e)[:, :R_out])
        curves_all["ell"].append(np.asarray(ell)[:, :R_out])
        curves_all["kld"].append(np.asarray(kld)[:, :R_out])
        if not np.isfinite(curves_all["elbo"][-1][-1]).all():
            bad = np.where(~np.isfinite(curves_all["elbo"][-1][-1]))[0]
            raise FloatingPointError(
                f"non-finite ELBO at epoch {done} in replicas {bad.tolist()}")
        if verbose_each:
            e_np = curves_all["elbo"][-1]
            m = (prev // verbose_each + 1) * verbose_each
            while m <= done:
                row = e_np[m - prev - 1]
                print(f"| epoch {m}/{epochs}  ELBO "
                      f"[{row.min():.3f} .. {row.max():.3f}] over {R_out} seeds")
                m += verbose_each
    curves = {k: np.concatenate(v, axis=0) for k, v in curves_all.items()}
    params_stack, opt_state, rngs = _slice_replicas(
        R, R_out, params_stack, opt_state, rngs)
    if return_state:
        return params_stack, curves, {"opt_state": opt_state,
                                      "rngs": _host_rngs(rngs),
                                      "opt_kind": opt,
                                      "clip_norm": clip_norm,
                                      "ng_t": ng_t}
    return params_stack, curves


def train_multiseed_minibatch(spec, params_stack, X_stack, Y_stack,
                              epochs: int, lr: float, batch_size: int,
                              opt: str = "adam", seed: int = 0,
                              clip_norm=None, verbose_each: int = 0,
                              specs=None, mesh=None, carry=None,
                              return_state: bool = False,
                              natgrad_gamma=None, natgrad_warmup=None,
                              natgrad_force: bool = False):
    """Minibatch-SVI battery: R replicas, each shuffling its own split with
    its own seeded generator (the Trainer's device-resident fast path,
    vmapped over the seed axis).  One epoch = one device program; the only
    per-epoch transfer is the (R, N) shuffle permutation.

    Matches the reference's protocol for N > batch datasets
    (protein/naval/year: batch 10000, code/main.py:74), including the
    drop_last=False remainder batch.  `mesh` shards the replica axis over
    'dp' exactly like `train_multiseed`.

    NOTE: donates params_stack/opt_state like `train_multiseed` — the
    caller's input device buffers are dead after the first chunk; use the
    returned stack (jnp.copy() the input first if it must stay live).
    """
    R, N = X_stack.shape[0], X_stack.shape[1]
    MB = int(batch_size)
    if MB >= N:
        return train_multiseed(spec, params_stack, X_stack, Y_stack, epochs,
                               lr, opt=opt, seed=seed, clip_norm=clip_norm,
                               verbose_each=verbose_each, specs=specs,
                               mesh=mesh, carry=carry,
                               return_state=return_state,
                               natgrad_gamma=natgrad_gamma,
                               natgrad_warmup=natgrad_warmup,
                               natgrad_force=natgrad_force)
    if natgrad_warmup is not None:
        raise NotImplementedError(
            "natgrad_warmup is full-batch-only in the vectorized batteries "
            "(the Trainer's minibatch path supports it; the measured Step*-"
            "arch failure mode is a full-batch protocol)")
    _check_replica_axis(params_stack, R)
    dtype = cfg.default_dtype()
    Xd = jnp.asarray(X_stack, dtype)
    Yraw = jnp.asarray(Y_stack)
    Yd = Yraw if jnp.issubdtype(Yraw.dtype, jnp.integer) else \
        jnp.asarray(Y_stack, dtype)
    ng_frozen, use_ng = _natgrad_extras(params_stack, natgrad_gamma)
    if use_ng:
        from .natgrad import guard_step_arch
        guard_step_arch(spec, natgrad_gamma, force=natgrad_force)
    optimizer = _optimizer(spec, params_stack, opt, lr, clip_norm, specs,
                           force_grouped=carry is not None or return_state,
                           extra_frozen=ng_frozen)
    opt_state, rngs = _resolve_carry(optimizer, params_stack, carry, R,
                                     seed, opt=opt, clip_norm=clip_norm)
    ng_step = None
    if use_ng:
        from .natgrad import natgrad_multiseed_step
        ng_step = natgrad_multiseed_step(spec, optimizer, natgrad_gamma)
    perm_sharding = None
    R_out = R
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        R, (params_stack, opt_state, Xd, Yd, rngs) = _pad_for_mesh(
            mesh, R, params_stack, opt_state, Xd, Yd, rngs)
        params_stack, opt_state, Xd, Yd, rngs = _shard_replica_axis(
            mesh, R, params_stack, opt_state, Xd, Yd, rngs)
        # per-chunk perms are (C, R, N): replica axis is dim 1
        perm_sharding = NamedSharding(mesh, P(None, "dp", None))
    n_batches = N // MB
    rem = N % MB

    def _one_step(p, s, keys, xb, yb):
        split = jax.vmap(jax.random.split)(keys)
        keys, sub = split[:, 0], split[:, 1]
        if ng_step is not None:
            p, s, aux = ng_step(p, s, xb, yb, sub)
            return p, s, keys, aux

        def loss_fn(pp):
            e, ell, kld = jax.vmap(
                lambda pr, xr, yr, rr: tgp_mod.elbo(spec, pr, xr, yr, rr)
            )(pp, xb, yb, sub)
            return -jnp.sum(e), (e, ell, kld)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, keys, aux

    def _epoch(carry, perm):
        # one epoch: scan over the full batches + drop_last=False remainder
        p, s, keys = carry
        idx = perm[:, :n_batches * MB].reshape(R, n_batches, MB)
        idx = jnp.swapaxes(idx, 0, 1)                       # (n_batches, R, MB)

        def body(c, ids):
            p, s, keys = c
            xb = jax.vmap(lambda xr, ir: jnp.take(xr, ir, axis=0))(Xd, ids)
            yb = jax.vmap(lambda yr, ir: jnp.take(yr, ir, axis=0))(Yd, ids)
            p, s, keys, aux = _one_step(p, s, keys, xb, yb)
            return (p, s, keys), aux

        (p, s, keys), (e, ell, kld) = jax.lax.scan(body, (p, s, keys), idx)
        if rem:
            ids = perm[:, n_batches * MB:]
            xb = jax.vmap(lambda xr, ir: jnp.take(xr, ir, axis=0))(Xd, ids)
            yb = jax.vmap(lambda yr, ir: jnp.take(yr, ir, axis=0))(Yd, ids)
            p, s, keys, _ = _one_step(p, s, keys, xb, yb)
        # per-epoch curves: the epoch's last full batch (Trainer semantics)
        return (p, s, keys), (e[-1], ell[-1], kld[-1])

    @partial(jax.jit, donate_argnums=(0, 1))
    def run_chunk(params, opt_state, rngs, perms):          # perms (C, R, N)
        (params, opt_state, rngs), curves = jax.lax.scan(
            _epoch, (params, opt_state, rngs), perms)
        return params, opt_state, rngs, curves

    # chunk several epochs into ONE device program: the per-program
    # dispatch cost (~30 ms over the remote tunnel) would otherwise stay
    # in the epoch loop; host-side PCG64 perms are precomputed per chunk
    # (bit-identical sequence), capped at ~32 MB of index uploads
    chunk = max(1, min((1 << 23) // max(R * N, 1), 200, epochs))
    # shuffle generators stay per REAL replica (R_out); padded replicas
    # reuse the last replica's permutations below, mirroring _pad_for_mesh
    gens = [np.random.Generator(np.random.PCG64(seed + 7919 * (r + 1)))
            for r in range(R_out)]
    if carry is not None and "gen_states" in carry:
        for g, st in zip(gens, carry["gen_states"]):
            g.bit_generator.state = st
    curves_all = {"elbo": [], "ell": [], "kld": []}
    import time as _time
    t0 = _time.time()
    done = 0
    while done < epochs:
        n = min(chunk, epochs - done)
        perms = np.stack(
            [np.stack([g.permutation(N) for g in gens]).astype(np.int32)
             for _ in range(n)])                            # (n, R_out, N)
        if R != R_out:   # padded replicas replay the last replica's perms
            perms = np.concatenate(
                [perms, np.repeat(perms[:, -1:, :], R - R_out, axis=1)],
                axis=1)
        if perm_sharding is not None:
            perms = jax.device_put(perms, perm_sharding)
        params_stack, opt_state, rngs, (e, ell, kld) = run_chunk(
            params_stack, opt_state, rngs, perms)
        prev = done
        done += n
        curves_all["elbo"].append(np.asarray(e)[:, :R_out])
        curves_all["ell"].append(np.asarray(ell)[:, :R_out])
        curves_all["kld"].append(np.asarray(kld)[:, :R_out])
        if not np.isfinite(curves_all["elbo"][-1][-1]).all():
            bad = np.where(~np.isfinite(curves_all["elbo"][-1][-1]))[0]
            raise FloatingPointError(
                f"non-finite ELBO at epoch {done} in replicas {bad.tolist()}")
        if verbose_each:
            e_np = curves_all["elbo"][-1]
            m = (prev // verbose_each + 1) * verbose_each
            while m <= done:
                row = e_np[m - prev - 1]
                print(f"| epoch {m}/{epochs}  ELBO "
                      f"[{row.min():.3f} .. {row.max():.3f}] over {R_out} seeds "
                      f"({(_time.time() - t0) / done * 1e3:.1f}ms/ep)")
                m += verbose_each
    curves = {k: np.concatenate(v, axis=0) for k, v in curves_all.items()}
    params_stack, opt_state, rngs = _slice_replicas(
        R, R_out, params_stack, opt_state, rngs)
    if return_state:
        return params_stack, curves, {
            "opt_state": opt_state, "rngs": _host_rngs(rngs),
            "opt_kind": opt, "clip_norm": clip_norm,
            "gen_states": [g.bit_generator.state for g in gens]}
    return params_stack, curves


def eval_multiseed(spec, params_stack, X_stack, Y_stack, Y_std_stack,
                   S_test: int = 100, seed: int = 1234,
                   fully_bayesian: bool = False, mesh=None):
    """Per-replica test metrics (the Trainer.compute_metrics definitions),
    computed fully on-device in one vmapped call.

    `mesh` shards the replica axis over 'dp' like train_multiseed.
    Returns dict of numpy arrays: logL (R, Dy) [per-point E[log p]],
    rmse (R, Dy) [Y_std-rescaled], coverage (R, Dy) for regression;
    logL (R,), acc (R,) for classification.
    """
    dtype = cfg.default_dtype()
    R = X_stack.shape[0]
    _check_replica_axis(params_stack, R)
    Xd = jnp.asarray(X_stack, dtype)
    Yraw = jnp.asarray(Y_stack)
    Yd = Yraw if jnp.issubdtype(Yraw.dtype, jnp.integer) else \
        jnp.asarray(Y_stack, dtype)
    Ystd = jnp.asarray(Y_std_stack, dtype)
    is_class = spec.likelihood.kind in ("bernoulli", "categorical")
    S_MC = S_test if fully_bayesian else 1

    @jax.jit
    def kernel(params, X, Y, Y_std, rng):
        r1, r2, r3 = jax.random.split(rng, 3)
        n = X.shape[0]
        log_p = tgp_mod.test_log_likelihood(
            spec, params, X, Y, Y_std, S_MC=S_MC,
            fully_bayesian=fully_bayesian, rng=r1)
        m1, _, _, _ = tgp_mod.predictive_distribution(
            spec, params, X, S_MC=S_MC, fully_bayesian=fully_bayesian, rng=r2)
        if is_class:
            pred = jnp.argmax(m1, axis=-1)
            acc = jnp.mean((pred == Y.reshape(-1)).astype(dtype))
            return {"logL": jnp.sum(log_p) / n, "acc": acc}
        samples, _, _ = tgp_mod.sample_predictive(
            spec, params, X, S_test, r3, fully_bayesian=fully_bayesian)
        q = jnp.quantile(samples, jnp.asarray([0.025, 0.975]), axis=1)
        inside = (Y.T >= q[0]) & (Y.T <= q[1])              # (Dy, MB)
        rmse = Y_std * jnp.sqrt(jnp.mean((m1 - Y.T) ** 2, axis=-1))
        return {"logL": log_p / n, "rmse": rmse,
                "coverage": jnp.mean(inside.astype(dtype), axis=-1)}

    rngs = jax.vmap(cfg.make_rng)(seed + jnp.arange(R))
    R_out = R
    if mesh is not None:
        R, (params_stack, Xd, Yd, Ystd, rngs) = _pad_for_mesh(
            mesh, R, params_stack, Xd, Yd, Ystd, rngs)
        params_stack, Xd, Yd, Ystd, rngs = _shard_replica_axis(
            mesh, R, params_stack, Xd, Yd, Ystd, rngs)
    out = jax.vmap(kernel)(params_stack, Xd, Yd, Ystd, rngs)
    return {k: np.asarray(v)[:R_out] for k, v in out.items()}
