"""Sweep runner — the python replacement for the reference's bash launchers.

    python experiments/sweep.py --suite regression --models SVGP TGP \
        --datasets boston power --seeds 1 2 3 --num_inducing 5 100 \
        [--epochs 15000] [--out results.jsonl]

Covers the reference grids (bash_scripts/launch_test_uci_*.sh): seeds 1-10 x
M in {5,10,20,50,100} x per-dataset flow architectures, with the
classification two-phase schedule that holds kernel parameters for the first
2000 epochs (Hensman 2015b; launcher :9).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

import exp_config as EC


def run_one(model, dataset, seed, M, epochs, precision, suite,
            arch_override=None):
    import numpy as np
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision(precision)
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from tgp.pytorch_tpu.data import return_dataset, kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows.core import IDENTITY_SPEC
    from tgp.pytorch_tpu.flows.initializers import fit_flow_to_identity

    loaders, dc = return_dataset(dataset, 10000, None, seed=seed)
    Dy, Dx = dc["Dy"], dc["Dx"]
    is_class = dc["task"] == "classification"
    Z0 = kmeans_centers(dc["X_tr"], M, n_init=10)

    # flow arch selection from the sweep tables (shared dispatch:
    # experiments/flow_arch.py keeps sweep and battery in lockstep)
    import flow_arch as FA
    flow_spec, flow_inits, fitted = IDENTITY_SPEC, None, None
    if model != "SVGP":
        np.random.seed(0)
        if model == "ID_TGP":
            flow_spec, flow_inits = FA.build_id_flow(dataset, Dx, is_class)
        else:
            arch, nb, ns = FA.resolve_tgp_arch(dataset, is_class,
                                               arch_override=arch_override)
            if FA.is_step_arch(arch):
                make = FA.make_step_gen(arch, nb, ns)
                y = dc["Y_tr"]
                flow_spec, fitted, _ = fit_flow_to_identity(
                    make,
                    float(np.min(y)) - 1, float(np.max(y)) + 1,
                    num_epochs=2000)
            else:
                flow_spec, flow_inits = FA.build_point_flow(arch, nb)

    # likelihood
    if is_class:
        if Dy == 2:
            lik = LikelihoodSpec("bernoulli", 1, quad_points=cfg.quad_points)
            Dy_model = 1
        else:
            lik = LikelihoodSpec("categorical", Dy, quad_points=cfg.quad_points,
                                 num_classes=Dy)
            Dy_model = Dy
    else:
        Dy_model = Dy
        lik = (LikelihoodSpec("gaussian", Dy) if model == "SVGP"
               else LikelihoodSpec("gaussian_flow", Dy, quad_points=cfg.quad_points))

    spec = Mm.TGPSpec(Dy=Dy_model, Dx=Dx, M=M, N=float(dc["N_tr"]),
                      kernel=K.from_name("scale_rbf"), likelihood=lik,
                      flow=flow_spec)
    params = Mm.init_tgp_params(
        spec, dc["X_tr"], Z0, variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=flow_inits)
    if fitted is not None:
        params["flow"] = jtu.tree_map(lambda x: jnp.stack([x] * Dy_model), fitted)

    # hypernet anchor fit for ID flows
    if model == "ID_TGP":
        from tgp.pytorch_tpu.flows.initializers import fit_hypernet_to_anchors
        batches = [b for b, _ in loaders[0]]
        fp0 = jtu.tree_map(lambda x: x[0], params["flow"])
        fp0, _ = fit_hypernet_to_anchors(flow_spec, fp0, batches, num_epochs=2000)
        params["flow"] = jtu.tree_map(lambda x: jnp.stack([x] * Dy_model), fp0)

    # ID hypernets keep their groups (wd 1e-5 on net_, reference
    # main.py:274-288) in EVERY phase — the classification hold phase
    # included (battery.py's specs_hold does the same)
    specs = None
    if model == "ID_TGP":
        specs = [[0.01, 1e-5, "net_"], [0.01, 0.0, "flow"]]
    # schedule: classification holds kernel params for 2000 epochs
    if is_class:
        frac = min(1.0, EC.HOLD_K_PARAMS_EPOCHS / epochs)
        sched = ([frac, 1.0 - frac],
                 [[[0.0, "kernel"]] + (specs or []), specs])
    else:
        sched = ([1.0], [specs])

    trainer = Trainer(spec, params, loaders, dc["Y_std"], S_test=100)
    t0 = time.time()
    trainer.train(epochs, 0.01, "adam", optimisation_schedule=sched,
                  verbose_each=0)
    elapsed = time.time() - t0
    metrics = trainer.compute_metrics()
    rec = {"model": model, "dataset": dataset, "seed": seed, "M": M,
           "epochs": epochs, "train_s": round(elapsed, 2)}
    for split, vals in metrics.items():
        for k, v in vals.items():
            if k == "calibration":
                rec[f"{split}_ECE"] = round(v["ECE"], 5)
            else:
                rec[f"{split}_{k}"] = (round(float(np.mean(v)), 5)
                                       if hasattr(v, "__len__") else round(float(v), 5))
    if model == "ID_TGP":
        trainer.fully_bayesian = True
        mb = trainer.compute_metrics()
        rec["test_logL_BA"] = round(float(np.mean(mb["test"]["logL"])), 5)
        if "rmse" in mb["test"]:
            rec["test_rmse_BA"] = round(float(np.mean(mb["test"]["rmse"])), 5)
    return rec


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", default="regression",
                   choices=["regression", "classification", "large"])
    p.add_argument("--models", nargs="+", default=["SVGP", "TGP", "ID_TGP"])
    p.add_argument("--datasets", nargs="+", default=None)
    p.add_argument("--seeds", nargs="+", type=int, default=EC.SWEEP_SEEDS)
    p.add_argument("--num_inducing", nargs="+", type=int,
                   default=EC.SWEEP_NUM_INDUCING)
    p.add_argument("--epochs", type=int, default=15000)
    p.add_argument("--precision", default="fp32")
    p.add_argument("--platform", default=None, choices=[None, "tpu", "cpu"],
                   help="pin the jax platform (the axon plugin ignores the "
                        "JAX_PLATFORMS env var; this uses jax.config)")
    p.add_argument("--out", default=None)
    p.add_argument("--arch", default=None,
                   help="override the TGP flow arch table: NAME:NUM_BLOCKS"
                        "[:NUM_STEPS], e.g. StepAllL:2 or StepTanhL:10:2")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    arch_override = None
    if args.arch:
        import flow_arch as FA
        arch_override = FA.parse_arch_flag(args.arch)

    if args.datasets is None:
        args.datasets = {
            "regression": list(EC.TGP_REGRESSION_SWEEP)[:9],
            "classification": list(EC.TGP_CLASSIFICATION_SWEEP),
            "large": ["year", "airline"],
        }[args.suite]

    out = open(args.out, "a") if args.out else None
    for model, ds, seed, M in itertools.product(
            args.models, args.datasets, args.seeds, args.num_inducing):
        try:
            rec = run_one(model, ds, seed, M, args.epochs, args.precision,
                          args.suite, arch_override=arch_override)
            if arch_override:
                rec["arch"] = args.arch
        except Exception as e:
            # record-and-continue for ANY per-cell failure: one diverging
            # cell (nan_guard FloatingPointError, a recorded behavior for
            # some archs) must not kill the rest of a multi-hundred-cell
            # grid.  The error lands in the jsonl, never hidden.
            rec = {"model": model, "dataset": ds, "seed": seed, "M": M,
                   "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(rec), flush=True)
        if out:
            out.write(json.dumps(rec) + "\n")
            out.flush()


if __name__ == "__main__":
    main()
