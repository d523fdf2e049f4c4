"""Natural-gradient VI A/B: epochs-to-NLL and wall-clock-to-NLL.

Capability beyond the reference (its trainer Adam-optimises q(U)'s (m, L)
like any other parameter — code/dsp/trainers/trainer_base.py:250-391).
`Trainer.train(..., natgrad_gamma=g)` moves q(U) to natural-gradient
ascent fused into the same backward pass (train/natgrad.py).

Protocol: UCI power split 1, M=100 (the flagship bench config), fp32,
full reference protocol constants otherwise.  Arms: SVGP and TGP(SAL x2),
each adam vs adam+NGD(gamma).  Test NLL/RMSE evaluated at epoch
checkpoints by chunked train() calls (optimizer moments carry across
calls); per-arm wall-clock recorded so the comparison is time-to-quality,
not just epochs-to-quality (the fused NGD step costs ~one extra O(M^3)
triangular block per step).

Usage: python benchmarks/natgrad_bench.py [--platform cpu] [--model TGP]
       [--dataset power] [--gamma 1.0] [--checkpoints 100,250,...]
Emits one JSON line per (arm, checkpoint) plus a summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))


def build(model, dataset, M, seed_split):
    import numpy as np
    from tgp.pytorch_tpu import config as cfg
    from tgp.pytorch_tpu.data import return_dataset, kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.flows.core import IDENTITY_SPEC
    from exp_config import return_hyperparams

    loaders, dc = return_dataset(dataset, 10000, None, seed=seed_split,
                                 options={"shuffle_train": True})
    Dy, Dx = dc["Dy"], dc["Dx"]
    Z0 = kmeans_centers(dc["X_tr"], M, n_init=10, seed=cfg.config_seed)

    finits = None
    if model == "TGP":
        # same table-arch dispatch as experiments/main.py (non-Step archs)
        import flow_arch as FA
        hp = return_hyperparams("TGP", dataset)
        if hp["flow_arch"] not in FA._PLAIN_ARCHS:
            raise SystemExit(
                f"natgrad_bench supports plain-arch datasets only "
                f"({', '.join(FA._PLAIN_ARCHS)}); {dataset}'s table arch is "
                f"{hp['flow_arch']} (needs the identity-fit initializer — "
                f"use experiments/main.py --natgrad instead)")
        np.random.seed(cfg.config_seed)
        fspec, finits = FA.build_point_flow(hp["flow_arch"],
                                            hp["num_blocks"])
        lik = LikelihoodSpec("gaussian_flow", Dy, noise_is_shared=False,
                             quad_points=cfg.quad_points)
    else:
        fspec = IDENTITY_SPEC
        lik = LikelihoodSpec("gaussian", Dy, noise_is_shared=False)

    spec = Mm.TGPSpec(Dy=Dy, Dx=Dx, M=M, N=float(dc["N_tr"]),
                      kernel=K.from_name("scale_rbf"), likelihood=lik,
                      flow=fspec)
    params = Mm.init_tgp_params(
        spec, dc["X_tr"], Z0, variance_scale=1e-5, mean_scale=0.0,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0,
                     "noisy_variance": 1e-6},
        noise_init=0.05, flow_inits=finits)
    return spec, params, loaders, dc


def run_arm(model, dataset, M, seed_split, gamma, checkpoints, lr):
    import numpy as np
    from tgp.pytorch_tpu.train import Trainer

    spec, params, loaders, dc = build(model, dataset, M, seed_split)
    tr = Trainer(spec, params, loaders, Y_std=dc["Y_std"], seed=0)
    rows, done, wall = [], 0, 0.0
    for ck in checkpoints:
        t0 = time.time()
        tr.train(ck - done, lr, "adam", verbose_each=0, natgrad_gamma=gamma)
        wall += time.time() - t0
        done = ck
        m = tr.compute_metrics()["test"]
        rows.append({"model": model, "gamma": gamma, "epoch": ck,
                     "train_wall_s": round(wall, 2),
                     "nll": round(-float(np.mean(m["logL"])), 4),
                     "rmse": round(float(np.mean(m["rmse"])), 4)})
        print(json.dumps(rows[-1]), flush=True)
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--model", default="both", choices=["SVGP", "TGP", "both"])
    ap.add_argument("--dataset", default="power")
    ap.add_argument("--num_inducing", type=int, default=100)
    ap.add_argument("--split", type=int, default=1)
    ap.add_argument("--gamma", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--checkpoints",
                    default="100,250,500,1000,2000,4000,8000,15000")
    args = ap.parse_args(argv)
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")

    cks = [int(x) for x in args.checkpoints.split(",")]
    models = ["SVGP", "TGP"] if args.model == "both" else [args.model]
    out = {}
    for model in models:
        for gamma in (None, args.gamma):
            rows = run_arm(model, args.dataset, args.num_inducing,
                           args.split, gamma, cks, args.lr)
            out[(model, gamma)] = rows

    for model in models:
        adam = out[(model, None)]
        ngd = out[(model, args.gamma)]
        target = adam[-1]["nll"]  # what Adam reaches with the full budget
        hit = next((r for r in ngd if r["nll"] <= target + 0.001), None)
        print(json.dumps({
            "summary": model, "dataset": args.dataset,
            "adam_final_nll": target,
            "adam_final_wall_s": adam[-1]["train_wall_s"],
            "ngd_final_nll": ngd[-1]["nll"],
            "ngd_epochs_to_adam_final": hit["epoch"] if hit else None,
            "ngd_wall_to_adam_final_s": hit["train_wall_s"] if hit else None,
        }), flush=True)


if __name__ == "__main__":
    main()
