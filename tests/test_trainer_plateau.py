"""Plateau guard: host-side early-stall detection (production failure
detection; motivated by the measured naval rng-stall and power-M=256
solve-precision plateau, PARITY.md)."""

import numpy as np
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.data.registry import return_dataset
from tgp.pytorch_tpu.data.kmeans import kmeans_centers
from tgp.pytorch_tpu.train.trainer import Trainer


def _trainer(batch=100):
    loaders, dc = return_dataset("boston", batch, None, seed=1)
    Z0 = kmeans_centers(dc["X_tr"], 5, n_init=2)
    spec = M.svgp_spec(Dy=1, Dx=dc["Dx"], M=5, N=float(dc["N_tr"]),
                       kernel=K.from_name("scale_rbf"),
                       likelihood=LikelihoodSpec("gaussian", 1,
                                                 quad_points=16))
    params = M.init_tgp_params(spec, dc["X_tr"], Z0, variance_scale=1e-5,
                               noise_init=0.05)
    return Trainer(spec, params, loaders, dc["Y_std"], S_test=8)


def test_plateau_guard_fires_and_records_event():
    tr = _trainer()
    # impossible improvement threshold => the first eligible check fires
    tr.plateau_guard = {"window": 20, "min_rel_improve": 1e9,
                        "max_fraction": 1.0, "action": "warn"}
    tr.train(120, 0.01, "adam", verbose_each=0)
    assert tr.plateau_events, "guard should have fired"
    ev = tr.plateau_events[0]
    assert ev["window"] == 20 and ev["epoch"] <= 120
    assert np.isfinite(ev["rel_improve"])


def test_plateau_guard_silent_when_improving():
    tr = _trainer()
    tr.plateau_guard = {"window": 20, "min_rel_improve": -1e9,
                        "max_fraction": 1.0}
    tr.train(120, 0.01, "adam", verbose_each=0)
    assert tr.plateau_events == []


def test_plateau_guard_raise_action():
    tr = _trainer()
    tr.plateau_guard = {"window": 20, "min_rel_improve": 1e9,
                        "max_fraction": 1.0, "action": "raise"}
    with pytest.raises(RuntimeError, match="plateau"):
        tr.train(120, 0.01, "adam", verbose_each=0)


def test_plateau_guard_ignores_late_flat_tail():
    tr = _trainer()
    # same impossible threshold, but checks only allowed in the first 10%
    # of training — by the first %50 check we're past it, so no event
    tr.plateau_guard = {"window": 20, "min_rel_improve": 1e9,
                        "max_fraction": 0.1}
    tr.train(120, 0.01, "adam", verbose_each=0)
    assert tr.plateau_events == []


def test_plateau_guard_default_off():
    tr = _trainer()
    tr.train(60, 0.01, "adam", verbose_each=0)
    assert tr.plateau_events == []
