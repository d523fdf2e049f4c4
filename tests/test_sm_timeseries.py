"""Spectral-mixture kernel end-to-end gate (the air-quality use case).

Trains an SVGP with a periodogram-seeded Periodic x RBF mixture
(reference: code/dsp/models/utils_models.py:216-274 seeded from
code/dsp/utils.py:58-97) on a small periodic series with a held-out
FORECAST window, and asserts it (a) trains stably and (b) beats the
scale-RBF baseline where RBF must revert to the mean.  The full-size
run is benchmarks/sm_timeseries.py (PARITY.md SM section).
"""

import numpy as np

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.ops.spectral import estimate_spectral_density
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.train import Trainer

N_HOURS, N_TR, M_IND, EPOCHS = 288, 240, 16, 600


def _series():
    rng = np.random.RandomState(0)
    t = np.arange(N_HOURS, dtype=np.float64)
    y = (1.5 * np.sin(2 * np.pi * t / 24.0 + 0.7)
         + 0.25 * rng.randn(N_HOURS))
    X, Y = t.reshape(-1, 1), y.reshape(-1, 1)
    Xtr, Ytr, Xte, Yte = X[:N_TR], Y[:N_TR], X[N_TR:], Y[N_TR:]
    mx, sx = Xtr.mean(), Xtr.std()
    my, sy = Ytr.mean(), Ytr.std()
    return ((Xtr - mx) / sx, (Ytr - my) / sy,
            (Xte - mx) / sx, (Yte - my) / sy)


def _train(kspec, kinit, kparams_override):
    Xtr, Ytr, Xte, Yte = _series()
    spec = M.TGPSpec(Dy=1, Dx=1, M=M_IND, N=float(N_TR), kernel=kspec,
                     likelihood=LikelihoodSpec("gaussian", 1))
    Z0 = np.linspace(Xtr.min(), Xtr.max(), M_IND).reshape(-1, 1)
    params = M.init_tgp_params(spec, Xtr, Z0, variance_scale=1e-5,
                               kernel_init=kinit, noise_init=0.05)
    if kparams_override is not None:
        params["kernel"] = kparams_override
    loaders = [DataLoader(ArrayDataset(Xtr, Ytr), 10000, seed=0),
               DataLoader(ArrayDataset(Xte, Yte), 10000, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=30)
    tr.train(EPOCHS, 0.01, "adam", verbose_each=0, clip_norm=100.0)
    m = tr.compute_metrics()["test"]
    return float(-m["logL"][0]), float(m["rmse"][0])


def test_sm_kernel_beats_rbf_on_forecast():
    Xtr, Ytr, _, _ = _series()
    freqs, periods, powers = estimate_spectral_density(
        Xtr[:, 0], Ytr[:, 0], prominence=1.0, return_power=True)
    assert periods, "periodogram found no peaks"
    top = int(np.argmax(powers))
    # the daily period must be recovered (24 h in z-scored time units)
    period = periods[top]
    sx = np.std(np.arange(N_TR, dtype=np.float64))
    assert abs(period - 24.0 / sx) / (24.0 / sx) < 0.2, period

    kspec = K.spectral_mixture(1, base="periodic")
    kparams = K.init_spectral_mixture_params(
        kspec, 1, 1, [period], [4.0 * period], [1.0])
    nll_sm, rmse_sm = _train(kspec, None, kparams)

    nll_rbf, rmse_rbf = _train(K.from_name("scale_rbf"),
                               {"length_scale": 2.0, "kernel_scale": 2.0},
                               None)
    assert np.isfinite(nll_sm) and np.isfinite(rmse_sm)
    # the seeded mixture must extrapolate the periodic structure
    assert nll_sm < nll_rbf - 0.1, (nll_sm, nll_rbf)
    assert rmse_sm < rmse_rbf, (rmse_sm, rmse_rbf)
