"""Optimizers and parameter-group machinery.

reference:
  * optimizer factory — code/dsp/trainers/optimizers.py:10-22 (adam, adam_W,
    adam_R (RAdam), sgd, lbfgs; RAdam vendored there, optax ships it),
  * parameter-group semantics — code/dsp/trainers/trainer_base.py:106-248:
    a specification is a list of [lr, name] or [lr, weight_decay, name]
    entries; `name` substring-matches parameter paths; lr == 0.0 removes the
    parameter from optimisation entirely; unmatched parameters get the
    global lr.

Here groups become an `optax.multi_transform` over a label pytree derived
from flattened parameter paths, which jits into a single update program —
no per-group python in the hot loop.

Weight decay follows torch's Adam semantics (L2 added to the gradient
*before* the moment updates), matching the reference's
`optim.Adam(weight_decay=...)` used for hypernet regularisation
(code/main.py:274-288).
"""

from __future__ import annotations

from typing import Sequence

import jax
import optax


def _base_transform(opt: str):
    table = {
        "adam": lambda: optax.scale_by_adam(),
        "adam_W": lambda: optax.scale_by_adam(),   # decoupled wd added below
        "adam_R": lambda: optax.scale_by_radam(),
        "sgd": lambda: optax.identity(),
    }
    if opt == "lbfgs":
        raise NotImplementedError(
            "lbfgs is a full solver with its own linesearch — it does not "
            "compose with parameter groups / schedules; use "
            "Trainer.train(opt='lbfgs') without an optimisation_schedule, "
            "or lbfgs_optimizer() directly")
    if opt not in table:
        raise NotImplementedError(f"optimizer {opt!r}")
    return table[opt]()


def lbfgs_optimizer(memory_size: int = 15):
    """L-BFGS with zoom linesearch (strong-Wolfe step sizes).

    The reference offers torch.optim.LBFGS with a constant lr and no
    linesearch (code/dsp/trainers/optimizers.py:29) — that configuration
    diverges on anything non-quadratic; optax's zoom linesearch makes the
    solver actually usable.  Update calls must pass value/grad/value_fn
    (see Trainer._make_lbfgs_scan)."""
    return optax.lbfgs(
        learning_rate=None,   # step size from the linesearch
        memory_size=memory_size,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=25),
    )


def make_optimizer(opt: str, lr: float, weight_decay: float = 0.0):
    """Single-group optimizer with torch-style L2 weight decay."""
    chain = []
    if weight_decay > 0.0 and opt != "adam_W":
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(_base_transform(opt))
    if weight_decay > 0.0 and opt == "adam_W":
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale(-lr))
    return optax.chain(*chain)


def param_paths(params):
    """Flattened '/'-joined path for every leaf, same treedef as params."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def fmt(path):
        parts = []
        for p in path:
            if isinstance(p, jax.tree_util.DictKey):
                parts.append(str(p.key))
            elif isinstance(p, jax.tree_util.SequenceKey):
                parts.append(str(p.idx))
            elif isinstance(p, jax.tree_util.GetAttrKey):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        return "/".join(parts)

    paths = [fmt(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, paths)


def build_grouped_optimizer(params, specs: Sequence, global_lr: float,
                            opt: str = "adam", frozen_labels=None):
    """Build a multi_transform optimizer from reference-style specs.

    Args:
      specs: iterable of [lr, name] or [lr, weight_decay, name]; `name`
             substring-matches the '/'-joined parameter path.  First match
             wins (the reference silently keeps the first group a parameter
             lands in, trainer_base.py:227-244).
      global_lr: lr for unmatched parameters.
      frozen_labels: optional pytree of bools marking always-frozen leaves
             (identity-mean projections, hypernet anchors).
    Returns (optimizer, label_pytree).
    """
    parsed = []
    for s in specs or []:
        if len(s) == 3:
            lr, wd, name = s
        elif len(s) == 2:
            lr, name = s
            wd = 0.0
        else:
            raise ValueError("spec entries must be [lr, name] or [lr, wd, name]")
        parsed.append((float(lr), float(wd), str(name)))

    paths = param_paths(params)

    def label_of(path, frozen):
        if frozen:
            return "__frozen__"
        for i, (lr, wd, name) in enumerate(parsed):
            if name in path:
                return "__frozen__" if lr == 0.0 else f"group{i}"
        return "__global__"

    if frozen_labels is None:
        labels = jax.tree_util.tree_map(lambda p: label_of(p, False), paths)
    else:
        labels = jax.tree_util.tree_map(label_of, paths, frozen_labels)

    transforms = {"__global__": make_optimizer(opt, global_lr),
                  "__frozen__": optax.set_to_zero()}
    for i, (lr, wd, name) in enumerate(parsed):
        if lr != 0.0:
            transforms[f"group{i}"] = make_optimizer(opt, lr, wd)

    return optax.multi_transform(transforms, labels), labels
