"""Checkpoint / resume — a capability the reference lacks entirely
(SURVEY.md §5: no torch.save/load anywhere; 15000-epoch fire-and-forget
jobs).

Backend: orbax array storage (atomic tmp+rename directories, optional async
save, sharded-array aware).  The pytree STRUCTURE (including custom nodes
like the grouped-Adam optimizer state) rides along as a pickled treedef
stored as a uint8 leaf inside the same atomic checkpoint, so restore
reproduces the exact python structure — orbax alone would return plain
dicts for custom nodes.
"""

from __future__ import annotations

import os
import pickle
import re
import shutil

import jax
import numpy as np
import orbax.checkpoint as ocp

_async_ckptr = None


def _checkpointer(async_save: bool):
    global _async_ckptr
    if not async_save:
        return ocp.PyTreeCheckpointer()
    if _async_ckptr is None:
        _async_ckptr = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _async_ckptr


def wait_for_checkpoints():
    """Block until pending async saves are durable."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def save_checkpoint(path: str, params, step: int = 0, opt_state=None,
                    extra: dict | None = None, async_save: bool = False):
    """Write checkpoint `<path>/step_<step>` atomically.

    async_save=True returns as soon as the arrays are snapshotted and
    flushes in the background (call wait_for_checkpoints() before exit).
    """
    state = {"step": step, "params": params, "opt_state": opt_state,
             "extra": extra or {}}
    leaves, treedef = jax.tree_util.tree_flatten(state)
    payload = {
        "leaves": [np.asarray(l) for l in leaves],
        "treedef": np.frombuffer(pickle.dumps(treedef), np.uint8).copy(),
    }
    final = os.path.join(os.path.abspath(path), f"step_{step}")
    if os.path.exists(final):
        shutil.rmtree(final)
    os.makedirs(os.path.dirname(final), exist_ok=True)
    _checkpointer(async_save).save(final, payload)
    return final


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    # only completed checkpoints: orbax names in-flight/crashed writes
    # 'step_<N>.orbax-checkpoint-tmp-<ts>', which must not be parsed (a
    # crashed save would otherwise break every subsequent resume) nor
    # resumed from (they are incomplete)
    steps = [int(m.group(1)) for d in os.listdir(path)
             if (m := re.fullmatch(r"step_(\d+)", d))]
    return max(steps) if steps else None


def load_checkpoint(path: str, step: int | None = None):
    """Load (params, opt_state, step, extra) with the exact saved pytree
    structure (custom optimizer-state nodes included).  Leaves come back as
    host numpy; device placement is the caller's concern."""
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    final = os.path.join(os.path.abspath(path), f"step_{step}")
    payload = ocp.PyTreeCheckpointer().restore(final)
    treedef = pickle.loads(bytes(np.asarray(payload["treedef"])))
    state = jax.tree_util.tree_unflatten(treedef, payload["leaves"])
    return (state["params"], state["opt_state"], int(state["step"]),
            state["extra"])
