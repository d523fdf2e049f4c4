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


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
