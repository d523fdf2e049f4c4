"""Spectral-mixture kernels on a synthetic LAQN-shaped periodic series.

The reference's air-quality use case (one month of hourly pm25 at one
LAQN site, reference: code/dsp/data/air_quality_timeseries.py:25-104)
seeds Periodic x RBF ('spectral_mixture') or Cosine x RBF ('sm') additive
mixtures from the empirical spectral density
(code/dsp/utils.py:58-97 + code/dsp/models/utils_models.py:216-274).
The raw LAQN data needs downloads (zero egress), so this benchmark runs
the same pipeline end to end on a synthetic hourly series with daily +
weekly harmonics:

  periodogram peak-picking -> top-K periods -> SM kernel seeding ->
  SVGP training -> FORECAST-window NLL/RMSE vs a scale-RBF baseline.

    python benchmarks/sm_timeseries.py [--platform cpu] [--epochs 4000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_series(n_hours=1344, seed=0):
    """8 weeks of hourly observations: daily + weekly harmonics + drift."""
    import numpy as np

    rng = np.random.RandomState(seed)
    t = np.arange(n_hours, dtype=np.float64)
    y = (1.5 * np.sin(2 * np.pi * t / 24.0 + 0.7)
         + 1.0 * np.sin(2 * np.pi * t / 168.0 + 2.1)
         + 0.4 * np.sin(2 * np.pi * t / 12.0 + 1.3)
         + 0.35 * rng.randn(n_hours))
    return t.reshape(-1, 1), y.reshape(-1, 1)


def run(kernel_name: str, epochs: int, M_ind: int = 50, num_comp: int = 2):
    import numpy as np
    import jax.numpy as jnp
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.ops.spectral import estimate_spectral_density
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer

    X, Y = make_series()
    n_tr = int(0.75 * X.shape[0])          # forecast split: last 2 weeks held out
    Xtr, Ytr, Xte, Yte = X[:n_tr], Y[:n_tr], X[n_tr:], Y[n_tr:]
    mu_y, sd_y = Ytr.mean(), Ytr.std()
    Ytr = (Ytr - mu_y) / sd_y
    Yte = (Yte - mu_y) / sd_y
    # z-score time the way the UCI pipeline z-scores X
    mu_x, sd_x = Xtr.mean(), Xtr.std()
    Xtr = (Xtr - mu_x) / sd_x
    Xte = (Xte - mu_x) / sd_x

    if kernel_name == "scale_rbf":
        kspec = K.from_name("scale_rbf")
        kinit = {"length_scale": 2.0, "kernel_scale": 2.0}
        kparams_override = None
    else:
        base = "periodic" if kernel_name == "spectral_mixture" else "cosine"
        freqs, periods, powers = estimate_spectral_density(
            Xtr[:, 0], Ytr[:, 0], prominence=1.0, return_power=True)
        if len(periods) == 0:
            raise ValueError(
                "no periodogram peaks cleared prominence — the SM seeding "
                "is meaningless here; use --kernel scale_rbf")
        if len(periods) < num_comp:
            # fewer periodogram peaks than components: clamp rather than
            # index past the peak list (a single-harmonic series is legal)
            print(f"# only {len(periods)} spectral peaks found; "
                  f"num_comp {num_comp} -> {len(periods)}")
            num_comp = len(periods)
        order = np.argsort(powers)[::-1][:num_comp]
        periods = [periods[i] for i in order]
        # magnitudes proportional to peak power share, lengthscale a few
        # periods wide so each component modulates slowly
        ptotal = sum(powers[i] for i in order)
        mags = [max(powers[i] / ptotal, 0.05) for i in order]
        lss = [4.0 * p for p in periods]
        kspec = K.spectral_mixture(num_comp, base=base)
        kinit = None
        kparams_override = K.init_spectral_mixture_params(
            kspec, 1, 1, periods, lss, mags)
        print(f"# {kernel_name}: detected periods {np.round(periods, 4)} "
              f"(hours: {np.round(np.asarray(periods) * sd_x, 1)}), "
              f"mags {np.round(mags, 3)}", flush=True)

    lik = LikelihoodSpec("gaussian", 1)
    spec = M.TGPSpec(Dy=1, Dx=1, M=M_ind, N=float(n_tr), kernel=kspec,
                     likelihood=lik)
    # evenly spaced inducing points over the train window
    Z0 = np.linspace(Xtr.min(), Xtr.max(), M_ind).reshape(-1, 1)
    params = M.init_tgp_params(spec, Xtr, Z0, variance_scale=1e-5,
                               kernel_init=kinit, noise_init=0.05)
    if kparams_override is not None:
        params["kernel"] = kparams_override

    loaders = [DataLoader(ArrayDataset(Xtr, Ytr), 10000, seed=0),
               DataLoader(ArrayDataset(Xte, Yte), 10000, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=100)
    t0 = time.time()
    tr.train(epochs, 0.01, "adam", verbose_each=0, clip_norm=100.0)
    train_s = time.time() - t0
    m = tr.compute_metrics()["test"]
    return {"kernel": kernel_name, "epochs": epochs, "M": M_ind,
            "components": (num_comp if kernel_name != "scale_rbf" else None),
            "forecast_nll": round(float(-m["logL"][0]), 4),
            "forecast_rmse": round(float(m["rmse"][0]), 4),
            "train_s": round(train_s, 2),
            "steps_per_sec": round(epochs / train_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--epochs", type=int, default=4000)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp64")   # parity-grade run; series is tiny
    recs = []
    for kern in ("scale_rbf", "spectral_mixture", "sm"):
        rec = run(kern, args.epochs)
        recs.append(rec)
        print(json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            for r in recs:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
