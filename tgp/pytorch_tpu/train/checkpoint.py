"""Checkpoint / resume — a capability the reference lacks entirely
(SURVEY.md §5: no torch.save/load anywhere; 15000-epoch fire-and-forget
jobs).  Implemented with orbax-style atomic directory checkpoints.
"""

from __future__ import annotations

import os
import pickle

import jax
import numpy as np


def save_checkpoint(path: str, params, step: int = 0, opt_state=None,
                    extra: dict | None = None):
    """Atomically write a checkpoint directory (host numpy arrays)."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".tmp_step_{step}")
    final = os.path.join(path, f"step_{step}")
    os.makedirs(tmp, exist_ok=True)
    payload = {
        "step": step,
        "params": jax.tree_util.tree_map(np.asarray, params),
        "opt_state": (jax.tree_util.tree_map(np.asarray, opt_state)
                      if opt_state is not None else None),
        "extra": extra or {},
    }
    with open(os.path.join(tmp, "state.pkl"), "wb") as f:
        pickle.dump(payload, f)
    if os.path.exists(final):
        import shutil
        shutil.rmtree(final)
    os.replace(tmp, final)
    return final


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(path)
             if d.startswith("step_")]
    return max(steps) if steps else None


def load_checkpoint(path: str, step: int | None = None):
    """Load (params, opt_state, step, extra); params come back as numpy and
    are converted on first use (device placement is the caller's concern)."""
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    with open(os.path.join(path, f"step_{step}", "state.pkl"), "rb") as f:
        payload = pickle.load(f)
    return payload["params"], payload["opt_state"], payload["step"], payload["extra"]
