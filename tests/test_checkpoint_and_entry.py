"""Checkpoint roundtrip + driver entry-point tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.train.checkpoint import (
    save_checkpoint, load_checkpoint, latest_step)


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(4.0), "nested": [{"W": jnp.eye(3)}]}
    save_checkpoint(str(tmp_path), params, step=10, extra={"lr": 0.01})
    save_checkpoint(str(tmp_path), params, step=20)
    assert latest_step(str(tmp_path)) == 20
    p, opt, step, extra = load_checkpoint(str(tmp_path), step=10)
    np.testing.assert_array_equal(p["a"], np.arange(4.0))
    np.testing.assert_array_equal(p["nested"][0]["W"], np.eye(3))
    assert extra["lr"] == 0.01 and step == 10


def test_graft_entry_single():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_graft_entry_multichip():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__ as g
    g.dryrun_multichip(8)
