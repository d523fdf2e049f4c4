"""Training loop: jit-compiled ELBO steps + evaluation metrics.

Replaces the reference trainer stack (code/dsp/trainers/trainer_base.py,
trainers_regression.py, trainers_classification.py) with:
  * one jitted `train_step` = value_and_grad(-ELBO) -> optax update, with
    donated parameter/optimizer-state buffers (no host sync per step; the
    reference's per-batch `.item()` readbacks forced a sync every step,
    trainer_base.py:347),
  * multi-phase optimisation schedules (percent-of-epochs with per-group
    lr/weight-decay, reference trainer_base.py:106-248) compiled as separate
    optimizer programs,
  * evaluation metrics (test log-lik, RMSE, 95% coverage / accuracy) from
    jitted kernels, quantiles on host.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as cfg
from ..models import tgp as tgp_mod
from ..models.tgp import TGPSpec
from .optimizers import build_grouped_optimizer, param_paths


def frozen_param_labels(spec: TGPSpec, params):
    """Bool pytree marking leaves excluded from optimisation:

      * the identity-mean projection W (a buffer in the reference,
        code/dsp/models/means.py:44-47),
      * hypernet anchor scalars of input-dependent flow steps — used only by
        the initializer and then switched off (reference:
        code/dsp/models/flow.py:778-792 `turn_off_initializer_parameters`).
    """
    paths = param_paths(params)
    flat_paths = jax.tree_util.tree_leaves(paths)
    # step prefixes that own a hypernet
    hyper_prefixes = set()
    for p in flat_paths:
        if "/net_" in p:
            hyper_prefixes.add(p.split("/net_")[0])

    def is_frozen(path):
        # identity-mean projection W (only the identity mean stores a 'W'
        # leaf) — frozen at any depth, incl. per-layer deep params
        if path.endswith("mean/W"):
            return True
        if path.endswith("/bn/mean") or path.endswith("/bn/var"):
            # hypernet batch-norm statistics: set by finalize_batch_norm
            # after training, never by gradients (torch running stats)
            return True
        for pre in hyper_prefixes:
            if path.startswith(pre + "/") and path[len(pre) + 1:] in ("a", "b", "c", "d"):
                return True
        return False

    return jax.tree_util.tree_map(is_frozen, paths)


def _uncommitted_key(key):
    """Host-backed/uncommitted view of an rng key for multi-process jit
    args.  Raw uint32 keys fetch to numpy; typed keys (cfg.set_rng_impl
    ('rbg')) cannot be np.asarray'd (CLAUDE.md round-4; multiseed.
    _host_rngs precedent) — round-trip through key_data/wrap_key_data."""
    if jnp.issubdtype(jnp.result_type(key), jax.dtypes.prng_key):
        data = np.asarray(jax.random.key_data(key))
        return jax.random.wrap_key_data(jnp.asarray(data),
                                        impl=jax.random.key_impl(key))
    return np.asarray(key)


@partial(jax.jit, static_argnums=(0, 4, 5, 6))
def _eval_batch(spec, params, X, Y, S_MC, fully_bayesian, S_test, Y_std, rng):
    """Jitted one-batch evaluation kernel, keyed by the hashable spec (not a
    Trainer instance, which would retrace per instance and pin params in the
    jit cache)."""
    r1, r2, r3 = jax.random.split(rng, 3)
    log_p = tgp_mod.test_log_likelihood(
        spec, params, X, Y, Y_std, S_MC=S_MC,
        fully_bayesian=fully_bayesian, rng=r1)
    m1, m2, _, _ = tgp_mod.predictive_distribution(
        spec, params, X, S_MC=S_MC, fully_bayesian=fully_bayesian, rng=r2)
    samples, _, _ = tgp_mod.sample_predictive(
        spec, params, X, S_test, r3, fully_bayesian=fully_bayesian)
    return log_p, m1, samples


class Trainer:
    """Owns the optimisation loop for one TGP model.

    Args mirror the reference trainers (Trainer_SP_regression,
    trainers_regression.py:300-341): data_loaders = [train(, valid), test],
    Y_std (Dy,), S_test MC/predictive samples.
    """

    #: datasets up to this many bytes are kept device-resident for the
    #: minibatch scan fast path
    DEVICE_RESIDENT_BYTES = 1 << 29

    def __init__(self, spec: TGPSpec, params, data_loaders, Y_std,
                 S_test: int = 100, validate_each: int = 10 ** 18,
                 seed: int = 0, track_fn=None, mesh=None):
        self.spec = spec
        self.mesh = mesh
        self._multihost = False
        if mesh is not None:
            # dp x ty multi-chip training (parallel/mesh.py): parameters are
            # placed with their mesh sharding once; jit propagates it through
            # the scan fast paths, and the optimizer state (zeros_like on the
            # sharded leaves) inherits it.  Batches are dp-sharded at upload.
            from ..parallel import param_sharding
            from ..parallel.multihost import is_multihost
            self._multihost = is_multihost(mesh)
            shardings = param_sharding(spec, params, mesh)
            if self._multihost:
                # multi-process (DCN) placement: every process passes its
                # process-local view; params are never dp-sharded, so the
                # local view is the full leaf (parallel/multihost.py)
                params = jax.tree_util.tree_map(
                    lambda x, sh: jax.make_array_from_process_local_data(
                        sh, np.asarray(x), np.shape(x)),
                    params, shardings)
            else:
                params = jax.device_put(params, shardings)
        self.params = params
        self.loaders = data_loaders
        self.train_loader = data_loaders[0]
        self.valid_loader = data_loaders[1] if len(data_loaders) == 3 else None
        self.test_loader = data_loaders[-1] if len(data_loaders) >= 2 else None
        self.Y_std = np.asarray(Y_std, dtype=np.float64).reshape(-1)
        self.S_test = S_test
        self.validate_each = validate_each
        self.track_fn = track_fn
        self._rng = cfg.make_rng(seed)
        self.loss_curve = []   # ELBO per step (device arrays, fetched lazily)
        self.ell_curve = []
        self.kld_curve = []
        self.fully_bayesian = False
        #: 'cpu' runs evaluation kernels on host — the analog of the
        #: reference's inference_in_cpu device swap
        #: (trainers_regression.py:161-179), useful when S_test blows device
        #: memory; None = same device as training.
        self.eval_device = None
        #: raise (with the offending parameter paths) when the ELBO goes
        #: non-finite — the jit-compatible analog of the reference's NanError
        #: raises (code/dsp/utils.py:241-254, flow.py:115-123).
        self.nan_guard = True
        #: optional early-stall detector (production failure detection).
        #: Two measured phenomena motivate it: the naval SAL_InvBCL arch's
        #: occasional under-converged rng runs (PARITY battery findings) and
        #: the power M=256 fast_solves+'high' deterministic ELBO plateau
        #: (PARITY solve-precision section).  Set to a dict to enable:
        #:   {"window": 2000,            # trailing steps per comparison half
        #:    "min_rel_improve": 1e-4,   # mean-ELBO improvement threshold
        #:    "max_fraction": 0.5,       # only flag in the first half — a
        #:                               # flat tail is ordinary convergence
        #:    "action": "warn"}          # or "raise" / "recover"
        #: Checks run host-side at chunk boundaries (no effect on the
        #: compiled step).  Fired events append to `self.plateau_events`;
        #: mitigations to try: a different training rng, --solve_warmup_epochs
        #: (solve-precision stalls), or 'highest' solve precision.
        #: "recover" applies the solve-precision mitigation automatically:
        #: when the guard fires while the spec runs a reduced-precision
        #: solve mode (fast_solves or solve_precision != 'highest'), the
        #: Trainer swaps the spec to trsm/'highest' in place and continues
        #: with the SAME optimizer state — the reactive twin of
        #: --solve_warmup_epochs' scheduled swap (both measured to recover
        #: the power M=256 stall, PARITY solve-precision section).  When the
        #: spec is already all-'highest' it degrades to "warn".
        self.plateau_guard = None
        self.plateau_events = []
        self._recover_pending = False
        self._opt_cache = None  # (labels_repr, optimizer, opt_state)

    # ------------------------------------------------------------------
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        # multi-process: hand jit a host-backed/uncommitted array so it is
        # auto-replicated (a committed local device array would conflict
        # with global args)
        return _uncommitted_key(sub) if self._multihost else sub

    def _put_batch(self, *arrays):
        """Upload batch arrays; dp-sharded across the mesh when one is set.

        A batch whose row count does not divide the 'dp' axis is left
        replicated (NamedSharding requires divisibility) — XLA still gets
        the 'ty' parallelism from the parameter shardings.

        Multi-process meshes (parallel/multihost.py): arrays arrive
        host-replicated (every process loads the same data, the seeded
        loaders guarantee it); each process contributes only its 'dp' row
        block, so no process materialises more than its shard."""
        dtype = cfg.default_dtype()
        if self._multihost:
            from ..parallel.multihost import global_batch, replicate_global
            arrays = tuple(np.asarray(a, dtype) for a in arrays)
            # 'dp' is process-major (a multiple of the process count), so
            # dp-divisibility implies the per-process row blocks are even
            if arrays[0].shape[0] % self.mesh.shape["dp"] == 0:
                return global_batch(self.mesh, *arrays)
            out = tuple(replicate_global(self.mesh, a) for a in arrays)
            return out if len(out) > 1 else out[0]
        arrays = tuple(jnp.asarray(a, dtype) for a in arrays)
        if self.mesh is not None and arrays[0].shape[0] % self.mesh.shape["dp"] == 0:
            from ..parallel import shard_batch
            return shard_batch(self.mesh, *arrays) if len(arrays) > 1 else \
                shard_batch(self.mesh, arrays[0])
        return arrays if len(arrays) > 1 else arrays[0]

    def _batch_constraint(self, xb, yb):
        """Inside-jit dp-sharding constraint for batches gathered from a
        device-resident dataset (minibatch scan path): with a mesh, the
        gather output is forced onto the 'dp' axis so each chip materialises
        only its batch shard."""
        if self.mesh is None or xb.shape[0] % self.mesh.shape["dp"] != 0:
            return xb, yb
        from jax.sharding import NamedSharding, PartitionSpec as P
        sh = NamedSharding(self.mesh, P("dp"))
        return (jax.lax.with_sharding_constraint(xb, sh),
                jax.lax.with_sharding_constraint(yb, sh))

    def _check_finite(self, where: str):
        if not self.nan_guard or not self.loss_curve:
            return
        if np.isfinite(float(self.loss_curve[-1])):
            return
        bad = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(self.params):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append("/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                                    for p in path))
        raise FloatingPointError(
            f"non-finite ELBO at {where}; non-finite parameters: {bad or 'none'}"
            f" — consider fp64 precision, a larger Cholesky jitter, or a "
            f"smaller learning rate")

    def _check_plateau(self, ep_done: int, total_epochs: int):
        g = self.plateau_guard
        if not g:
            return
        w = int(g.get("window", 2000))
        if len(self.loss_curve) < 2 * w:
            return
        rec_at = g.get("_recovered_at")
        if rec_at is not None and len(self.loss_curve) < rec_at + 2 * w:
            # just recovered: wait for two fresh windows of post-swap
            # trajectory before judging the plateau again
            return
        if ep_done > g.get("max_fraction", 0.5) * total_epochs:
            return
        recent = float(np.mean(np.asarray(self.loss_curve[-w:], np.float64)))
        prev = float(np.mean(np.asarray(self.loss_curve[-2 * w:-w],
                                        np.float64)))
        rel = (recent - prev) / (abs(prev) + 1e-12)
        if rel >= g.get("min_rel_improve", 1e-4):
            return
        event = {"step": len(self.loss_curve), "epoch": ep_done,
                 "rel_improve": rel, "window": w,
                 "elbo_recent": recent, "elbo_prev": prev}
        self.plateau_events.append(event)
        msg = (f"ELBO plateau at epoch {ep_done}/{total_epochs}: mean over "
               f"the last {w} recorded steps improved by {rel:.2e} rel "
               f"(< {g.get('min_rel_improve', 1e-4):.0e}) while only "
               f"{100 * ep_done / total_epochs:.0f}% through training — "
               f"suspicious early stall; try another training rng, "
               f"solve_precision='highest', or --solve_warmup_epochs")
        action = g.get("action", "warn")
        if action == "recover" and (self.spec.fast_solves or
                                    self.spec.solve_precision != "highest"):
            event["action"] = "recover"
            g["_recovered_at"] = len(self.loss_curve)
            self._recover_pending = True
            print(f"RECOVERING: {msg}", flush=True)
            return
        if action == "raise":
            raise RuntimeError(msg)
        print(f"WARNING: {msg}", flush=True)

    def _maybe_recover_spec(self) -> bool:
        """Consume a pending plateau-recovery request.

        Swaps the solve mode to the all-'highest' trajectory (fast_solves
        off) on `self.spec` and returns True so the calling loop rebuilds
        its compiled step for the new spec.  The optimizer and its state
        are untouched — Adam moments carry across the swap exactly like
        --solve_warmup_epochs' scheduled version (spec-swap bit-equivalence
        is tested there); only the direction differs: reactive downgrade
        instead of scheduled upgrade."""
        if not self._recover_pending:
            return False
        self._recover_pending = False
        import dataclasses
        self.spec = dataclasses.replace(self.spec, fast_solves=False,
                                        solve_precision="highest")
        print("plateau recovery: solves switched to trsm/'highest' with "
              "optimizer moments carried", flush=True)
        return True

    def _chunk_gammas(self, n: int):
        """Next n values of the natgrad warmup ramp (advances the global
        step counter).  Host-side precompute; rides the scan as xs."""
        from .natgrad import gamma_at
        t = np.arange(self._ng_t, self._ng_t + n)
        self._ng_t += n
        return jnp.asarray(
            gamma_at(self._natgrad_gamma, self._natgrad_warmup, t),
            cfg.default_dtype())

    def _make_train_step(self, optimizer):
        spec = self.spec

        gamma = getattr(self, "_natgrad_gamma", None)
        if gamma is not None:
            # fused hybrid step: hyperparameter grads (Adam) and
            # dELBO/d(m, S) (natural gradient on q) from ONE backward pass
            from .natgrad import natgrad_train_step
            return jax.jit(natgrad_train_step(spec, optimizer, gamma),
                           donate_argnums=(0, 1))

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, X, Y, rng):
            def loss_fn(p):
                e, ell, kld = tgp_mod.elbo(spec, p, X, Y, rng)
                return -e, (ell, kld)

            (neg_elbo, (ell, kld)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, (-neg_elbo, ell, kld)

        return train_step

    def _make_minibatch_scan(self, optimizer, MB: int):
        """Minibatch SVI fast path: the dataset lives on-device; one epoch =
        a `lax.scan` over gathered batches.

        The reference re-uploads every batch and syncs per step
        (trainer_base.py:330,347); here the whole epoch is one device
        program — the shuffle permutation (host numpy, seeded for parity
        with the DataLoader) is the only per-epoch transfer.  An airline-
        scale dataset (2M x 9 fp32 ~ 72 MB) sits comfortably in HBM.
        """
        spec = self.spec
        gamma = getattr(self, "_natgrad_gamma", None)

        @partial(jax.jit, donate_argnums=(0, 1))
        def run_epoch(params, opt_state, Xd, Yd, perm, rng, gammas=None):
            n_batches = perm.shape[0] // MB
            idx = perm[:n_batches * MB].reshape(n_batches, MB)
            rngs = jax.random.split(rng, n_batches)

            def body(carry, inp):
                p, s = carry
                ids, r, g = inp
                xb = jnp.take(Xd, ids, axis=0)
                yb = jnp.take(Yd, ids, axis=0)
                xb, yb = self._batch_constraint(xb, yb)
                if gamma is not None:
                    from .natgrad import natgrad_train_step
                    p, s, out = natgrad_train_step(spec, optimizer, gamma)(
                        p, s, xb, yb, r, g)
                    return (p, s), out

                def loss_fn(pp):
                    e, ell, kld = tgp_mod.elbo(spec, pp, xb, yb, r)
                    return -e, (ell, kld)

                (neg_e, (ell, kld)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                updates, s = optimizer.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), (-neg_e, ell, kld)

            gs = (jnp.full((n_batches,), gamma or 0.0, cfg.default_dtype())
                  if gammas is None else gammas)
            (params, opt_state), curves = jax.lax.scan(
                body, (params, opt_state), (idx, rngs, gs))
            return params, opt_state, curves

        return run_epoch

    def _make_lbfgs_scan(self, optimizer, frozen):
        """Full-batch L-BFGS: K solver iterations as one device program.

        The objective must be deterministic for the linesearch to be
        meaningful, so ONE rng is fixed for the whole run (stochastic-flow
        models should prefer adam).  Frozen leaves get zeroed gradients so
        the two-loop recursion never builds directions along them.  ELL/KLD
        curves carry the same per-step values as the other paths.
        """
        spec = self.spec

        # no donation here: optax.lbfgs state caches the params pytree, so
        # params and opt_state alias the same buffers at the first call —
        # donating both is a double-donate error
        @partial(jax.jit, static_argnums=(5,))
        def run_steps(params, opt_state, X, Y, rng, n_steps):
            def loss_aux(pp):
                e, ell, kld = tgp_mod.elbo(spec, pp, X, Y, rng)
                return -e, (ell, kld)

            def loss_fn(pp):
                return loss_aux(pp)[0]

            def mask(g):
                return jax.tree_util.tree_map(
                    lambda gg, fz: jnp.zeros_like(gg) if fz else gg, g, frozen)

            def body(carry, _):
                p, s = carry
                (neg_e, (ell, kld)), grads = jax.value_and_grad(
                    loss_aux, has_aux=True)(p)
                grads = mask(grads)
                updates, s = optimizer.update(
                    grads, s, p, value=neg_e, grad=grads,
                    value_fn=lambda pp: loss_fn(pp))
                p = optax.apply_updates(p, updates)
                return (p, s), (-neg_e, ell, kld)

            (params, opt_state), curves = jax.lax.scan(
                body, (params, opt_state), None, length=n_steps)
            return params, opt_state, curves

        return run_steps

    def _make_scan_steps(self, optimizer):
        """Full-batch fast path: K optimisation steps as ONE device program.

        When the dataset fits in a single batch (the reference's headline
        configs: batch 10000 >= N for boston/power, code/main.py:74), the
        epoch loop is a `lax.scan` over steps — thousands of epochs execute
        per device call, amortising host->device dispatch latency entirely.

        With a natgrad warmup ramp the per-step gamma values ride the scan
        as a second xs array (host-precomputed per chunk) — the constant-
        gamma and plain-Adam programs are unchanged.
        """
        spec = self.spec
        gamma = getattr(self, "_natgrad_gamma", None)
        warm = getattr(self, "_natgrad_warmup", None)

        if gamma is not None and warm:
            from .natgrad import natgrad_train_step
            ng = natgrad_train_step(spec, optimizer, gamma)

            @partial(jax.jit, donate_argnums=(0, 1))
            def run_steps_warm(params, opt_state, X, Y, rng, gammas):
                def body(carry, xs):
                    p, s = carry
                    r, g = xs
                    p, s, out = ng(p, s, X, Y, r, g)
                    return (p, s), out

                rngs = jax.random.split(rng, gammas.shape[0])
                (params, opt_state), curves = jax.lax.scan(
                    body, (params, opt_state), (rngs, gammas))
                return params, opt_state, curves

            return run_steps_warm

        @partial(jax.jit, static_argnums=(5,), donate_argnums=(0, 1))
        def run_steps(params, opt_state, X, Y, rng, n_steps):
            def body(carry, r):
                p, s = carry
                if gamma is not None:
                    from .natgrad import natgrad_train_step
                    p, s, out = natgrad_train_step(spec, optimizer, gamma)(
                        p, s, X, Y, r)
                    return (p, s), out
                def loss_fn(pp):
                    e, ell, kld = tgp_mod.elbo(spec, pp, X, Y, r)
                    return -e, (ell, kld)
                (neg_e, (ell, kld)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p)
                updates, s = optimizer.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), (-neg_e, ell, kld)

            rngs = jax.random.split(rng, n_steps)
            (params, opt_state), curves = jax.lax.scan(
                body, (params, opt_state), rngs)
            return params, opt_state, curves

        return run_steps

    # ------------------------------------------------------------------
    def train(self, epochs: int, lr_ALL: float, opt: str = "adam",
              optimisation_schedule=None, verbose_each: int = 100,
              clip_norm: float | None = None,
              natgrad_gamma: float | None = None,
              natgrad_warmup: int | None = None,
              natgrad_force: bool = False):
        """Run the optimisation loop.

        optimisation_schedule = (percentages, specifications) exactly like
        the reference (trainer_base.py:250-299): percentages of `epochs`
        per phase; each phase's specification is a list of [lr(,wd),name]
        entries (None = all parameters at lr_ALL).

        Optimizer state carries across phase boundaries and train() calls
        for the whole Adam family (adam/adam_W/adam_R) with torch
        `add_param_group` semantics — pre-existing groups keep their
        moments and per-leaf step counts, newly activated parameters start
        fresh (reference trainer_base.py:271-318, `keep_parameter_groups`).
        'sgd' (momentum 0 upstream) is stateless, so its per-phase rebuild
        is observationally identical.

        natgrad_warmup: linear ramp gamma_t = natgrad_gamma * min(1,
        (t+1)/K) over the first K natgrad steps (Salimbeni et al. 2018).
        The step counter t persists across train() calls while natgrad
        stays on (schedule continuity for segmented protocols, like the
        Adam moments) and resets when a call runs without natgrad_gamma.
        """
        if optimisation_schedule is None:
            optimisation_schedule = ([1.0], [None])
        percentages, specifications = optimisation_schedule
        if abs(sum(percentages) - 1.0) > 1e-9:
            raise ValueError(f"schedule percentages must sum to 1, got {sum(percentages)}")

        frozen = frozen_param_labels(self.spec, self.params)
        self._natgrad_gamma = natgrad_gamma
        if natgrad_warmup is not None and natgrad_gamma is None:
            raise ValueError("natgrad_warmup needs natgrad_gamma")
        if natgrad_warmup is not None and int(natgrad_warmup) < 1:
            raise ValueError(
                f"natgrad_warmup must be >= 1 (got {natgrad_warmup})")
        self._natgrad_warmup = (int(natgrad_warmup)
                                if natgrad_warmup is not None else None)
        # global natgrad-step counter: the warmup ramp continues across
        # train() calls (checkpoint-segmented protocols), like the Adam
        # moments; reset when natgrad is off
        if natgrad_gamma is None or not hasattr(self, "_ng_t"):
            self._ng_t = 0
        if natgrad_gamma is not None:
            # natural-gradient VI (train/natgrad.py): q(U) leaves leave the
            # gradient optimizer entirely (the frozen mask) and are updated
            # by the natural-gradient step appended to every train step.
            if natgrad_gamma <= 0.0:
                raise ValueError(
                    f"natgrad_gamma must be > 0 (got {natgrad_gamma}); "
                    "gamma=0 would freeze q(U) out of BOTH optimizers — "
                    "pass None to train q(U) with the gradient optimizer")
            if opt == "lbfgs":
                raise NotImplementedError(
                    "natgrad_gamma is not supported with lbfgs (two solvers "
                    "fighting over one objective)")
            if not (isinstance(self.params, dict) and "q_mu" in self.params):
                raise NotImplementedError(
                    "natgrad_gamma needs a single-layer q(U) at "
                    "params['q_mu'/'q_L']; deep stacks keep Adam on q")
            from .natgrad import guard_step_arch
            guard_step_arch(self.spec, natgrad_gamma, force=natgrad_force)
            paths = param_paths(self.params)
            frozen = jax.tree_util.tree_map(
                lambda fr, p: bool(fr) or p.endswith("q_mu") or p.endswith("q_L"),
                frozen, paths)
        ep_done = 0
        # periodic validation works with the scan path by aligning chunk
        # boundaries to validate_each; on multi-process meshes every process
        # reaches the same boundaries in lockstep and compute_metrics'
        # accumulator psum is the only collective
        ve = self.validate_each if self.validate_each else 10 ** 18
        full_batch = (len(self.train_loader) == 1 and self.track_fn is None)
        for per, specs in zip(percentages, specifications):
            phase_epochs = int(epochs * per)
            if opt == "lbfgs":
                # full solver with its own linesearch: full-batch only, no
                # parameter groups (the reference's torch LBFGS has the same
                # restrictions de facto: one group, closure-based steps)
                if specs is not None:
                    raise NotImplementedError(
                        "lbfgs does not support optimisation schedules")
                if not full_batch:
                    raise NotImplementedError(
                        "lbfgs requires the full-batch path (one batch, no "
                        "track_fn) — its linesearch needs a deterministic "
                        "objective")
                from .optimizers import lbfgs_optimizer
                optimizer = lbfgs_optimizer()
                # keep save()'s opt_kind label honest (the other kinds set
                # this inside _build_phase_optimizer, which lbfgs skips)
                self._opt_state_kind = "lbfgs"
            else:
                optimizer = self._build_phase_optimizer(specs, lr_ALL, opt,
                                                        frozen, clip_norm)
            opt_state = optimizer.init(self.params)

            if full_batch:
                # scan-compiled epochs: one device call per chunk
                run_steps = (self._make_lbfgs_scan(optimizer, frozen)
                             if opt == "lbfgs"
                             else self._make_scan_steps(optimizer))
                X, Y = next(iter(self.train_loader))
                Xd, Yd = self._put_batch(X, Y)
                # chunk boundaries align to validate_each (eval must stop
                # the scan); the verbose cadence is printed from the
                # fetched per-epoch curves instead of shrinking the device
                # program — with the default verbose_each=100 a cap here
                # would turn ~8 dispatches into ~150, each paying the
                # ~30 ms tunnel cost
                chunk = int(min(phase_epochs, 2000, ve))
                done = 0
                t0 = time.time()
                # L-BFGS: ONE rng for the whole phase, not one per chunk —
                # the linesearch/curvature memory carries across chunk
                # boundaries, so the objective must not shift with them
                # (_make_lbfgs_scan's determinism requirement)
                phase_rng = self._next_rng() if opt == "lbfgs" else None
                while done < phase_epochs:
                    n = min(chunk, phase_epochs - done,
                            ve - (ep_done % ve) if ve <= epochs else chunk)
                    self.params, opt_state, curves = run_steps(
                        self.params, opt_state, Xd, Yd,
                        phase_rng if opt == "lbfgs" else self._next_rng(),
                        self._chunk_gammas(n) if self._natgrad_warmup else n)
                    prev_ep = ep_done
                    done += n
                    ep_done += n
                    self.loss_curve.extend(np.asarray(curves[0]))
                    self.ell_curve.extend(np.asarray(curves[1]))
                    self.kld_curve.extend(np.asarray(curves[2]))
                    self._check_finite(f"epoch {ep_done}")
                    self._check_plateau(ep_done, epochs)
                    if self._maybe_recover_spec():
                        run_steps = (self._make_lbfgs_scan(optimizer, frozen)
                                     if opt == "lbfgs"
                                     else self._make_scan_steps(optimizer))
                    # honour the requested cadence like the other two
                    # paths: one line per verbose_each multiple the chunk
                    # crossed, values read from the fetched curves
                    if verbose_each:
                        base = len(self.loss_curve) - ep_done
                        m = (prev_ep // verbose_each + 1) * verbose_each
                        while m <= ep_done:
                            print(f"| epoch {m}/{epochs}  ELBO "
                                  f"{float(self.loss_curve[base + m - 1]):.4f} "
                                  f"({(time.time() - t0) / done * 1e3:.2f}"
                                  f"ms/ep)")
                            m += verbose_each
                    if ve <= epochs and ep_done % ve == 0:
                        print(f"|   eval @ {ep_done}: {self.compute_metrics()}")
                self._opt_state_carry = opt_state
                continue

            ds = self.train_loader.dataset
            n_bytes = (ds.X.nbytes + ds.Y.nbytes)
            device_resident = (self.track_fn is None
                               and n_bytes <= self.DEVICE_RESIDENT_BYTES)
            if device_resident:
                MB = self.train_loader.batch_size
                run_epoch = self._make_minibatch_scan(optimizer, MB)
                # the resident dataset stays replicated (each chip gathers its
                # own dp shard of every shuffled batch locally)
                if self._multihost:
                    from ..parallel.multihost import replicate_global
                    Xd = replicate_global(self.mesh,
                                          np.asarray(ds.X, cfg.default_dtype()))
                    Yd = replicate_global(self.mesh,
                                          np.asarray(ds.Y, cfg.default_dtype()))
                else:
                    Xd = jnp.asarray(ds.X, cfg.default_dtype())
                    Yd = jnp.asarray(ds.Y, cfg.default_dtype())
                n = ds.X.shape[0]
                rem = n % MB
                tail_step = self._make_train_step(optimizer) if rem else None
                t0 = time.time()
                for ep in range(phase_epochs):
                    perm = (self.train_loader._rng.permutation(n)
                            if self.train_loader.shuffle else np.arange(n))
                    self.params, opt_state, curves = run_epoch(
                        self.params, opt_state, Xd, Yd,
                        np.asarray(perm, np.int32), self._next_rng(),
                        self._chunk_gammas(n // MB)
                        if self._natgrad_warmup else None)
                    if rem:
                        # remainder batch (the reference's drop_last=False)
                        ids = np.asarray(perm[n - rem:], np.int32)
                        self.params, opt_state, _ = tail_step(
                            self.params, opt_state,
                            jnp.take(Xd, ids, axis=0), jnp.take(Yd, ids, axis=0),
                            self._next_rng(),
                            *((self._chunk_gammas(1)[0],)
                              if self._natgrad_warmup else ()))
                    ep_done += 1
                    self.loss_curve.append(curves[0][-1])
                    self.ell_curve.append(curves[1][-1])
                    self.kld_curve.append(curves[2][-1])
                    if ep_done % 50 == 0:
                        self._check_finite(f"epoch {ep_done}")
                        self._check_plateau(ep_done, epochs)
                        if self._maybe_recover_spec():
                            run_epoch = self._make_minibatch_scan(optimizer, MB)
                            if rem:
                                tail_step = self._make_train_step(optimizer)
                    if verbose_each and (ep_done % verbose_each == 0):
                        print(f"| epoch {ep_done}/{epochs}  "
                              f"ELBO {float(self.loss_curve[-1]):.4f} "
                              f"({(time.time() - t0) / (ep + 1) * 1e3:.2f}ms/ep)")
                    if ve <= epochs and ep_done % ve == 0:
                        print(f"|   eval @ {ep_done}: {self.compute_metrics()}")
                self._opt_state_carry = opt_state
                continue

            step_fn = self._make_train_step(optimizer)
            t0 = time.time()
            for ep in range(phase_epochs):
                for X, Y in self.train_loader:
                    Xd, Yd = self._put_batch(X, Y)
                    self.params, opt_state, (e, ell, kld) = step_fn(
                        self.params, opt_state, Xd, Yd, self._next_rng(),
                        *((self._chunk_gammas(1)[0],)
                          if self._natgrad_warmup else ()))
                    self.loss_curve.append(e)
                    self.ell_curve.append(ell)
                    self.kld_curve.append(kld)
                    if self.track_fn is not None:
                        self.track_fn(self)
                ep_done += 1
                if ep_done % 50 == 0:
                    self._check_finite(f"epoch {ep_done}")
                    self._check_plateau(ep_done, epochs)
                    if self._maybe_recover_spec():
                        step_fn = self._make_train_step(optimizer)
                if verbose_each and (ep_done % verbose_each == 0):
                    print(f"| epoch {ep_done}/{epochs}  ELBO {float(e):.4f} "
                          f"ELL {float(ell):.4f} KLD {float(kld):.4f} "
                          f"({(time.time() - t0) / max(ep,1):.3f}s/ep)")
                if self.validate_each and (ep_done % self.validate_each == 0):
                    m = self.compute_metrics()
                    print(f"|   eval @ {ep_done}: {m}")
            self._opt_state_carry = opt_state
        if self.spec.has_bn_flow:
            # recalibrate hypernet batch-norm statistics on the train inputs
            # so evaluation uses frozen stats (torch eval-mode BN semantics)
            ds = self.train_loader.dataset
            self.params = tgp_mod.finalize_batch_norm(self.spec, self.params,
                                                      ds.X)
        return self

    # ------------------------------------------------------------------
    # Checkpoint / resume (capability the reference lacks, SURVEY.md §5)
    # ------------------------------------------------------------------
    def save(self, path: str, step: int | None = None,
             async_save: bool = False):
        """Checkpoint the full training state: params, carried optimizer
        moments, and the rng stream position — enough for `restore` to
        continue a run bit-exactly (provided the remaining epochs use the
        same chunking, which holds for the default chunk size)."""
        import pickle
        from .checkpoint import save_checkpoint
        # the shuffle rng position matters for bit-exact resume: a fresh
        # loader would replay the first epoch's permutation, changing the
        # summation order of every batch
        loader_state = np.frombuffer(
            pickle.dumps(self.train_loader._rng.bit_generator.state),
            np.uint8).copy()
        opt_kind = getattr(self, "_opt_state_kind", "adam")
        # typed keys (cfg.set_rng_impl('rbg')) are stored as raw key_data +
        # impl name so the checkpoint stays a plain-array pytree ('raw' =
        # classic uint32 key, restored verbatim)
        rng_leaf, rng_impl = self._rng, "raw"
        if jnp.issubdtype(rng_leaf.dtype, jax.dtypes.prng_key):
            rng_impl = str(jax.random.key_impl(rng_leaf))
            rng_leaf = jax.random.key_data(rng_leaf)
        return save_checkpoint(
            path, self.params, step=len(self.loss_curve) if step is None else step,
            opt_state=getattr(self, "_opt_state_carry", None),
            extra={"rng": rng_leaf,
                   "rng_impl": np.frombuffer(rng_impl.encode(), np.uint8).copy(),
                   "fully_bayesian": np.asarray(self.fully_bayesian),
                   "loader_state": loader_state,
                   # natgrad warmup position: without it a restored run
                   # would replay the gamma ramp from t=0 (schedule
                   # continuity is part of the bit-exact-resume contract)
                   "ng_t": np.asarray(getattr(self, "_ng_t", 0)),
                   "opt_kind": np.frombuffer(opt_kind.encode(), np.uint8).copy()},
            async_save=async_save)

    def restore(self, path: str, step: int | None = None):
        """Load a checkpoint written by `save` into this Trainer."""
        from .checkpoint import load_checkpoint
        params, opt_state, step, extra = load_checkpoint(path, step)
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        if opt_state is not None:
            self._opt_state_carry = opt_state
        rng_impl = (bytes(np.asarray(extra["rng_impl"])).decode()
                    if "rng_impl" in extra else "raw")
        self._rng = (jnp.asarray(extra["rng"]) if rng_impl == "raw"
                     else jax.random.wrap_key_data(jnp.asarray(extra["rng"]),
                                                   impl=rng_impl))
        self.fully_bayesian = bool(extra["fully_bayesian"])
        if "loader_state" in extra:
            import pickle
            self.train_loader._rng.bit_generator.state = pickle.loads(
                bytes(np.asarray(extra["loader_state"])))
        if "opt_kind" in extra:
            self._opt_state_kind = bytes(np.asarray(extra["opt_kind"])).decode()
        elif opt_state is not None:
            self._opt_state_kind = "adam"   # pre-kind checkpoints were adam
        if "ng_t" in extra:
            self._ng_t = int(np.asarray(extra["ng_t"]))
        if self.mesh is not None:
            from ..parallel import param_sharding
            shardings = param_sharding(self.spec, self.params, self.mesh)
            if self._multihost:
                # same placement rule as __init__: a multi-process mesh
                # spans non-addressable devices, so plain device_put would
                # fail — every process contributes its local (= full,
                # params are never dp-sharded) view
                self.params = jax.tree_util.tree_map(
                    lambda x, sh: jax.make_array_from_process_local_data(
                        sh, np.asarray(x), np.shape(x)),
                    self.params, shardings)
            else:
                self.params = jax.device_put(self.params, shardings)
        return step

    def _build_phase_optimizer(self, specs, lr_ALL, opt, frozen,
                               clip_norm=None):
        """Per-phase optimizer.

        The Adam family ('adam' — the reference's default everywhere —
        plus 'adam_W' and 'adam_R') uses the per-leaf grouped
        implementation whose moment/count state carries across phases and
        train() calls — torch `add_param_group` semantics
        (reference trainer_base.py:271-318 `keep_parameter_groups`); a
        parameter first activated in a later phase starts with fresh
        moments.  Switching `kind` between train() calls resets the state
        (moments from a different rule would be meaningless).  'sgd' uses
        the optax multi_transform path; it is stateless (torch SGD at the
        reference's default momentum=0), so per-phase rebuild loses
        nothing.
        """
        if opt in ("adam", "adam_W", "adam_R"):
            from . import group_adam as GA
            import optax as _optax

            lr_t, wd_t, act_t = GA.annotations_from_specs(
                self.params, specs, lr_ALL, frozen_labels=frozen,
                # the reference runs torch.optim.AdamW with defaults, so
                # wd=0.01 applies to every group that doesn't override it
                default_wd=0.01 if opt == "adam_W" else 0.0)
            carried = getattr(self, "_opt_state_carry", None)
            carry_ok = (carried is not None
                        and isinstance(carried, GA.GroupAdamState)
                        and getattr(self, "_opt_state_kind", None) == opt)
            self._opt_state_kind = opt

            def init_fn(params):
                if carry_ok:
                    return carried
                return GA.init_state(params)

            def update_fn(grads, state, params=None):
                if clip_norm is not None:
                    # global-norm gradient clipping: flows with derivative
                    # singularities (inverse-Box-Cox at its sign crossing)
                    # emit rare huge spikes that would poison Adam moments
                    gnorm = _optax.global_norm(grads)
                    scale = jnp.minimum(1.0, clip_norm / (gnorm + 1e-12))
                    grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
                return GA.update(grads, state, params, lr_t, wd_t, act_t,
                                 kind=opt)

            return _optax.GradientTransformation(init_fn, update_fn)

        # sgd: stateless, so the per-phase optax rebuild has no observable
        # reset (torch SGD with the reference's default momentum=0 keeps no
        # moments either)
        self._opt_state_kind = opt   # keep save()'s opt_kind label honest
        optimizer, _ = build_grouped_optimizer(
            self.params, specs, lr_ALL, opt, frozen_labels=frozen)
        if clip_norm is not None:
            import optax as _optax
            optimizer = _optax.chain(_optax.clip_by_global_norm(clip_norm),
                                     optimizer)
        return optimizer

    # ------------------------------------------------------------------
    # Evaluation (reference: trainers_regression.py:108-225)
    # ------------------------------------------------------------------
    def _eval_batch(self, params, X, Y, S_MC, fully_bayesian, Y_std, rng):
        # classification metrics never read the predictive samples (only
        # log_p and the class probabilities) — S_test=1 keeps XLA from
        # computing S_test posterior sample paths per batch for nothing
        s = (1 if self.spec.likelihood.kind in ("bernoulli", "categorical")
             else self.S_test)
        return _eval_batch(self.spec, params, X, Y, S_MC, fully_bayesian,
                           s, Y_std, rng)

    def _metrics_for_loader(self, loader, shard=None, params=None):
        """Accumulate metric sums over `loader` and finalize.

        shard=(p, nproc): evaluate only this process's contiguous slice of
        every batch's rows and return RAW accumulators (the multihost path
        psums them and finalizes globally); params overrides self.params
        (host-fetched copies on multi-process meshes)."""
        spec = self.spec
        Dy = spec.Dy
        is_class = spec.likelihood.kind in ("bernoulli", "categorical")
        ElogL = np.zeros(1 if is_class else Dy)
        rmse = np.zeros(Dy)
        coverage = np.zeros(Dy)
        correct = 0.0
        tot = 0
        all_probs, all_labels = [], []
        Y_std_d = jnp.asarray(self.Y_std, cfg.default_dtype())
        S_MC = self.S_test if self.fully_bayesian else 1
        if params is None:
            params = self.params
        for X, Y in loader:
            rng = self._next_rng()   # advance in lockstep on every process
            if shard is not None:
                p, nproc = shard
                rows = np.array_split(np.arange(np.shape(X)[0]), nproc)[p]
                if rows.size == 0:
                    continue
                X, Y = np.asarray(X)[rows], np.asarray(Y)[rows]
                # decorrelate the MC draws across row shards (typed rbg
                # keys pass through fold_in directly; raw ones via asarray)
                k = rng if jnp.issubdtype(jnp.result_type(rng),
                                          jax.dtypes.prng_key) \
                    else jnp.asarray(rng)
                rng = _uncommitted_key(jax.random.fold_in(k, p))
            Xd = jnp.asarray(X, cfg.default_dtype())
            Yd = jnp.asarray(Y, cfg.default_dtype())
            log_p, m1, samples = self._eval_batch(
                params, Xd, Yd, S_MC, self.fully_bayesian, Y_std_d, rng)
            log_p = np.asarray(log_p)
            m1 = np.asarray(m1)
            tot += X.shape[0]
            if is_class:
                ElogL[0] += log_p.sum()
                pred = np.argmax(m1, axis=-1)
                correct += (pred == np.asarray(Y).reshape(-1)).sum()
                all_probs.append(m1)
                all_labels.append(np.asarray(Y).reshape(-1))
            else:
                samples = np.asarray(samples)  # (Dy, S, MB)
                q = np.quantile(samples, [0.025, 0.975], axis=1)  # (2, Dy, MB)
                for d in range(Dy):
                    ElogL[d] += log_p[d]
                    rmse[d] += np.sum((m1[d] - np.asarray(Y)[:, d]) ** 2)
                    inside = (np.asarray(Y)[:, d] >= q[0, d]) & (np.asarray(Y)[:, d] <= q[1, d])
                    coverage[d] += inside.sum()
        if shard is not None:
            from .metrics import calibration_accumulators
            calib = None
            if is_class:
                # fixed length even for a row-less shard: every process must
                # contribute the same vector shape to the psum (the empty
                # call keeps the length coupled to metrics.py's bin count)
                calib = (calibration_accumulators(
                    np.concatenate(all_probs), np.concatenate(all_labels))
                    if all_probs else calibration_accumulators(
                        np.zeros((0, 2)), np.zeros(0, dtype=int)))
            return {"ElogL": ElogL, "rmse": rmse, "coverage": coverage,
                    "correct": correct, "tot": float(tot), "calib": calib}
        out = {"logL": ElogL / tot}
        if is_class:
            out["acc"] = correct / tot
            # native calibration metrics replacing the reference's external
            # pytorchlib.compute_calibration_measures (sparse_MF_SP.py:813-815)
            from .metrics import calibration_measures
            out["calibration"] = calibration_measures(
                np.concatenate(all_probs), np.concatenate(all_labels))
        else:
            out["rmse"] = self.Y_std * np.sqrt(rmse / tot)
            out["coverage"] = coverage / tot
        return out

    def compute_metrics(self):
        """Full-split metrics for train/valid/test.
        reference: trainers_regression.py:108-155."""
        if self._multihost:
            return self._compute_metrics_multihost()
        import contextlib
        ctx = contextlib.nullcontext()
        if self.eval_device == "cpu":
            ctx = jax.default_device(jax.devices("cpu")[0])
        with ctx:
            res = {"train": self._metrics_for_loader(self.train_loader)}
            if self.valid_loader is not None:
                res["valid"] = self._metrics_for_loader(self.valid_loader)
            if self.test_loader is not None:
                res["test"] = self._metrics_for_loader(self.test_loader)
        return res

    def _compute_metrics_multihost(self):
        """Multi-process eval: each process evaluates its contiguous row
        slice of every batch with host-fetched parameter copies (purely
        process-local programs — the global ty/dp shardings never enter the
        eval kernels), then the metric accumulators are cross-process
        psummed and finalized identically to the single-process path.
        Scales the reference eval loop (trainers_regression.py:108-155) the
        way train() scales its step: same program on every process, only
        placement differs."""
        from ..parallel.multihost import fetch_params, psum_across_processes
        nproc = len({d.process_index for d in self.mesh.devices.flat})
        p = jax.process_index()
        params_host = fetch_params(self.params)
        loaders = [("train", self.train_loader)]
        if self.valid_loader is not None:
            loaders.append(("valid", self.valid_loader))
        if self.test_loader is not None:
            loaders.append(("test", self.test_loader))
        res = {}
        # honour eval_device='cpu' like the single-process path (eval
        # programs are process-local, so the placement choice is free)
        dev = (jax.devices("cpu")[0] if self.eval_device == "cpu"
               else jax.local_devices()[0])
        with jax.default_device(dev):
            for name, loader in loaders:
                acc = self._metrics_for_loader(loader, shard=(p, nproc),
                                               params=params_host)
                has_calib = acc["calib"] is not None
                # every accumulator is a sum over rows -> psum composes
                vec = np.concatenate(
                    [acc["ElogL"], acc["rmse"], acc["coverage"],
                     [acc["correct"], acc["tot"]]]
                    + ([acc["calib"]] if has_calib else []))
                vec = psum_across_processes(self.mesh, vec)
                nL, Dy = len(acc["ElogL"]), self.spec.Dy
                ElogL, rest = vec[:nL], vec[nL:]
                rmse_s, cov_s = rest[:Dy], rest[Dy:2 * Dy]
                correct, tot = rest[2 * Dy], rest[2 * Dy + 1]
                out = {"logL": ElogL / tot}
                if self.spec.likelihood.kind in ("bernoulli", "categorical"):
                    out["acc"] = correct / tot
                    if has_calib:
                        from .metrics import calibration_from_accumulators
                        out["calibration"] = calibration_from_accumulators(
                            rest[2 * Dy + 2:])
                else:
                    out["rmse"] = self.Y_std * np.sqrt(rmse_s / tot)
                    out["coverage"] = cov_s / tot
                res[name] = out
        return res
