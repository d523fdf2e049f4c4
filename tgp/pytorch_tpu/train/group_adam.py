"""Per-leaf grouped Adam family with torch `add_param_group` semantics.

The reference keeps one live torch optimizer across schedule phases and
train() calls (`keep_parameter_groups`, trainer_base.py:271-318): a
parameter added in a later phase starts with fresh Adam moments and its own
step count, while pre-existing groups keep theirs.  optax.multi_transform
can't express that (its state is partitioned by a fixed label pytree), so
this module implements the Adam family directly over full-shaped moment
pytrees with per-leaf (lr, weight_decay, active) annotations:

  * inactive leaves (frozen / lr=0 / not yet added): no update, no moment
    accumulation, count frozen — exactly "not in the optimizer",
  * bias correction uses the per-leaf count (steps since activation),
  * `kind` selects the update rule, matching what the reference's factory
    ACTUALLY instantiates (code/dsp/trainers/optimizers.py:10-22 — its
    vendored warmup-AdamW/PlainRAdam classes are dead code there); all
    three share the (count, mu, nu) state so phase changes just swap
    annotations and the state carries:
      - 'adam':   torch Adam — weight decay is L2 added to the gradient
                  before the moments,
      - 'adam_W': torch AdamW — decoupled multiplicative decay
                  p <- p - lr*wd*p before the step, eps OUTSIDE the
                  bias-corrected sqrt (torch semantics; the reference
                  runs torch's default wd=0.01 — the Trainer passes that
                  default through annotations_from_specs),
      - 'adam_R': RAdam with degenerated_to_sgd=False, as the reference
                  constructs it (optimizers.py:16) — rectified variance
                  step when rho_t >= 5, NO update at all (not even weight
                  decay) below; moments/count still accumulate.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GroupAdamState(NamedTuple):
    count: object  # pytree of int32 scalars (per leaf)
    mu: object
    nu: object


def init_state(params) -> GroupAdamState:
    zeros = lambda x: jnp.zeros_like(x)
    return GroupAdamState(
        count=jax.tree_util.tree_map(lambda _: jnp.zeros((), jnp.int32), params),
        mu=jax.tree_util.tree_map(zeros, params),
        nu=jax.tree_util.tree_map(zeros, params),
    )


def update(grads, state: GroupAdamState, params, lr_tree, wd_tree, active_tree,
           b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
           kind: str = "adam"):
    """One step of the `kind` update rule (see module docstring).

    lr/wd are per-leaf scalars; active is per-leaf bool.
    Returns (updates, new_state): apply with optax.apply_updates.
    """
    if kind not in ("adam", "adam_W", "adam_R"):
        raise NotImplementedError(f"grouped optimizer kind {kind!r}")

    def leaf(g, p, mu, nu, cnt, lr, wd, active):
        if kind == "adam":
            g = g + wd * p                   # torch L2-into-grad
        new_cnt = jnp.where(active, cnt + 1, cnt)
        new_mu = jnp.where(active, b1 * mu + (1 - b1) * g, mu)
        new_nu = jnp.where(active, b2 * nu + (1 - b2) * jnp.square(g), nu)
        t = jnp.maximum(new_cnt, 1).astype(p.dtype)
        b1t = b1 ** t
        b2t = b2 ** t
        if kind == "adam":
            mu_hat = new_mu / (1 - b1t)
            nu_hat = new_nu / (1 - b2t)
            upd = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        elif kind == "adam_W":
            # torch.optim.AdamW: decoupled p <- p*(1 - lr*wd), then the
            # standard bias-corrected Adam step (eps outside sqrt(nu_hat))
            mu_hat = new_mu / (1 - b1t)
            nu_hat = new_nu / (1 - b2t)
            upd = -lr * mu_hat / (jnp.sqrt(nu_hat) + eps) - lr * wd * p
        else:  # adam_R, degenerated_to_sgd=False (reference optimizers.py:16)
            rho_inf = 2.0 / (1.0 - b2) - 1.0
            rho_t = rho_inf - 2.0 * t * b2t / (1 - b2t)
            # rectification term; the max() keeps the sqrt finite in the
            # warm-up region (rho_t < 5) where no step is taken at all
            r_num = (1 - b2t) * (rho_t - 4) / (rho_inf - 4) \
                * (rho_t - 2) / rho_t * rho_inf / (rho_inf - 2)
            r = jnp.sqrt(jnp.maximum(r_num, 0.0))
            rect = (-lr * (r / (1 - b1t)) * new_mu / (jnp.sqrt(new_nu) + eps)
                    - wd * lr * p)
            upd = jnp.where(rho_t >= 5.0, rect, jnp.zeros_like(p))
        upd = jnp.where(active, upd, 0.0)
        return upd.astype(p.dtype), new_mu, new_nu, new_cnt

    flat_g, treedef = jax.tree_util.tree_flatten(grads)
    flat_p = treedef.flatten_up_to(params)
    flat_mu = treedef.flatten_up_to(state.mu)
    flat_nu = treedef.flatten_up_to(state.nu)
    flat_cnt = treedef.flatten_up_to(state.count)
    flat_lr = treedef.flatten_up_to(lr_tree)
    flat_wd = treedef.flatten_up_to(wd_tree)
    flat_act = treedef.flatten_up_to(active_tree)

    outs = [leaf(g, p, mu, nu, cnt, lr, wd, act)
            for g, p, mu, nu, cnt, lr, wd, act in
            zip(flat_g, flat_p, flat_mu, flat_nu, flat_cnt, flat_lr, flat_wd,
                flat_act)]
    updates = treedef.unflatten([o[0] for o in outs])
    new_state = GroupAdamState(
        count=treedef.unflatten([o[3] for o in outs]),
        mu=treedef.unflatten([o[1] for o in outs]),
        nu=treedef.unflatten([o[2] for o in outs]),
    )
    return updates, new_state


def annotations_from_specs(params, specs, global_lr, frozen_labels=None,
                           default_wd: float = 0.0):
    """Build (lr_tree, wd_tree, active_tree) from reference-style specs
    ([lr(,wd),name] substring entries; lr=0 or frozen -> inactive).

    default_wd applies to unmatched parameters and to 2-entry specs that
    don't set wd explicitly — torch semantics, where a param group without
    weight_decay uses the optimizer's default (0.01 for torch AdamW, which
    the reference runs with defaults, optimizers.py:14)."""
    from .optimizers import param_paths

    parsed = []
    for s in specs or []:
        if len(s) == 3:
            lr, wd, name = s
        else:
            (lr, name), wd = s, default_wd
        parsed.append((float(lr), float(wd), str(name)))

    paths = param_paths(params)

    def annotate(path, frozen):
        if frozen:
            return (0.0, 0.0, False)
        for lr, wd, name in parsed:
            if name in path:
                return (lr, wd, lr != 0.0)
        return (float(global_lr), float(default_wd), True)

    if frozen_labels is None:
        ann = jax.tree_util.tree_map(lambda p: annotate(p, False), paths)
    else:
        ann = jax.tree_util.tree_map(annotate, paths, frozen_labels)
    lr_tree = jax.tree_util.tree_map(lambda a: a[0], ann,
                                     is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3 and isinstance(x[2], bool))
    wd_tree = jax.tree_util.tree_map(lambda a: a[1], ann,
                                     is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3 and isinstance(x[2], bool))
    act_tree = jax.tree_util.tree_map(lambda a: a[2], ann,
                                      is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3 and isinstance(x[2], bool))
    return lr_tree, wd_tree, act_tree
