"""Test harness config: virtual 8-device CPU mesh, float64.

Sharding tests use a virtual CPU mesh instead of real chips (the driver
separately dry-runs the multichip path via __graft_entry__.dryrun_multichip).
"""

import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8 "
                      + os.environ.get("XLA_FLAGS", ""))

import jax

jax.config.update("jax_platforms", "cpu")

from tgp.pytorch_tpu import config as cfg

cfg.set_precision("fp64")

import pytest


@pytest.fixture(autouse=True)
def _restore_precision():
    """Global precision is process-wide mutable state (cfg.set_precision);
    a test or a CLI main() invoked in-process that switches it must not
    leak into later tests (found: test_battery_paths' fp32 cells broke
    test_bayesian_estimator's fp64 tolerances)."""
    prev = cfg.precision()
    yield
    if cfg.precision() != prev:
        cfg.set_precision(prev)


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
