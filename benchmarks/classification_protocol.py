"""Full classification protocol on synthetic corpora.

The real UCI classification corpora need downloads (zero egress); this
benchmark runs the reference's *protocol* end to end on synthetic data:
  * binary (Bernoulli, Gauss-CDF link) with an SAL_InvBCL flow — the
    heart-style config,
  * 3-class categorical with per-class BCL_AL flows — the activity-style
    config,
  * the two-phase schedule holding kernel parameters for the first 2000
    epochs (Hensman 2015b; reference launcher hold_K_params),
  * accuracy + NLL + ECE reporting.

    python benchmarks/classification_protocol.py [--platform cpu] [--epochs 6000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(kind: str, epochs: int):
    import numpy as np
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.data import kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    rng = np.random.RandomState(0)
    N, Dx = 1200, 4
    X = rng.randn(N, Dx)
    if kind == "binary":
        logits = np.sin(2 * X[:, 0]) + X[:, 1] * X[:, 2]
        y = (logits + 0.4 * rng.randn(N) > 0).astype(np.float64).reshape(-1, 1)
        C, Dy_model = 2, 1
        lik = LikelihoodSpec("bernoulli", 1, quad_points=50)
        np.random.seed(0)
        fl = G.build_chain("SAL_InvBCL", 1)
    else:
        W = rng.randn(Dx, 3)
        scores = np.tanh(X @ W) + 0.3 * rng.randn(N, 3)
        y = np.argmax(scores, axis=1).astype(np.float64).reshape(-1, 1)
        C, Dy_model = 3, 3
        lik = LikelihoodSpec("categorical", 3, quad_points=32, num_classes=3)
        np.random.seed(0)
        fl = G.build_chain("BCL_AL", 1)
    fspec, finits = spec_from_list(fl)

    n_tr = int(0.9 * N)
    Xtr, ytr, Xte, yte = X[:n_tr], y[:n_tr], X[n_tr:], y[n_tr:]
    M_ind = 50
    Z0 = kmeans_centers(Xtr, M_ind, n_init=10)
    spec = M.TGPSpec(Dy=Dy_model, Dx=Dx, M=M_ind, N=float(n_tr),
                     kernel=K.from_name("scale_rbf"), likelihood=lik, flow=fspec)
    params = M.init_tgp_params(spec, Xtr, Z0, variance_scale=1e-5,
                               kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
                               flow_inits=finits)
    loaders = [DataLoader(ArrayDataset(Xtr, ytr), 10000, seed=0),
               DataLoader(ArrayDataset(Xte, yte), 10000, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=50)
    hold = min(2000, epochs // 3)
    sched = ([hold / epochs, 1 - hold / epochs], [[[0.0, "kernel"]], None])
    import time
    t0 = time.time()
    tr.train(epochs, 0.01, "adam", optimisation_schedule=sched, verbose_each=0,
             clip_norm=100.0)
    train_s = time.time() - t0
    m = tr.compute_metrics()["test"]
    return {"task": kind, "classes": C, "epochs": epochs,
            "test_acc": round(float(m["acc"]), 4),
            "test_nll": round(float(-m["logL"][0]), 4),
            "ECE": round(m["calibration"]["ECE"], 4),
            "train_s": round(train_s, 2),
            "steps_per_sec": round(epochs / train_s, 1)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--epochs", type=int, default=6000)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    for kind in ("binary", "categorical"):
        print(json.dumps(run(kind, args.epochs)), flush=True)


if __name__ == "__main__":
    main()
