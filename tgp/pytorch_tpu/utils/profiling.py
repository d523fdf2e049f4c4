"""Profiling helpers: jax.profiler traces + step timing.

The reference prints wall-clock minutes per epoch
(code/dsp/trainers/trainers_regression.py:261-262); here proper XLA traces
(viewable in TensorBoard / Perfetto) and a cheap step timer that respects
async dispatch (block_until_ready before reading the clock).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace around a code block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class step_timer:
    """Measure per-call wall time of a jitted function, sync-correct."""

    def __init__(self, fn):
        self.fn = fn
        self.times = []

    def __call__(self, *args, **kwargs):
        t0 = time.perf_counter()
        out = self.fn(*args, **kwargs)
        jax.block_until_ready(out)
        self.times.append(time.perf_counter() - t0)
        return out

    @property
    def mean(self):
        return sum(self.times) / max(1, len(self.times))
