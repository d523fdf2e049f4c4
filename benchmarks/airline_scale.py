"""Airline-scale minibatch-SVI benchmark (BASELINE.json config 5).

Runs TGP minibatch SVI on an airline-shaped dataset (2M rows x 8 features,
synthetic when the real corpus is absent — zero-egress environments can't
download the 2008 flights data), with the device-resident epoch-scan path:
the full dataset lives in HBM (~70 MB) and one epoch (200+ optimizer steps)
executes as a single device program.

    python benchmarks/airline_scale.py [--rows 2000000] [--M 500] [--epochs 3]

Time-to-quality mode: `--checkpoints 1,2,4,8 [--natgrad 0.1]` holds out
50k rows (the real corpus's own test split when present), trains in
chunks with carried optimizer moments, and emits one JSON line per
checkpoint with held-out NLL/RMSE — the stochastic natural-gradient A/B
at production scale (PARITY.md natgrad section for the full-batch case).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows", type=int, default=2_000_000)
    p.add_argument("--M", type=int, default=500)
    p.add_argument("--batch", type=int, default=10000)
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--platform", default=None)
    p.add_argument("--fast_solves", action="store_true")
    p.add_argument("--solve_precision", default="highest",
                   choices=["highest", "high", "default"])
    p.add_argument("--natgrad_warmup", type=int, default=None, metavar="K",
                   help="linear gamma ramp over the first K optimizer steps "
                        "(Salimbeni et al. 2018 minibatch-NGD schedule)")
    p.add_argument("--natgrad", type=float, default=None, metavar="GAMMA",
                   help="natural-gradient VI on q(U) (stochastic/minibatch "
                        "NGD, Salimbeni et al. 2018)")
    p.add_argument("--checkpoints", default=None,
                   help="comma-separated epoch checkpoints; switches to "
                        "time-to-quality mode with held-out NLL/RMSE")
    p.add_argument("--test_rows", type=int, default=50_000)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    import numpy as np
    import jax
    import jax.numpy as jnp
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.data import kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    # real corpus if present, else airline-shaped synthetic
    try:
        from tgp.pytorch_tpu.data.large import load_airline
        split = load_airline(seed=1)
        X, Y = split["X_tr"], split["Y_tr"]
        X_te, Y_te = split["X_te"][:args.test_rows], split["Y_te"][:args.test_rows]
        src = "airline.csv"
    except FileNotFoundError:
        rng = np.random.RandomState(0)
        n_all = args.rows + args.test_rows
        Xa = rng.randn(n_all, 8)
        f = np.sin(Xa[:, :1]) + 0.3 * Xa[:, 1:2] * Xa[:, 2:3]
        Ya = f + 0.3 * rng.randn(n_all, 1)
        X, Y = Xa[:args.rows], Ya[:args.rows]
        X_te, Y_te = Xa[args.rows:], Ya[args.rows:]
        src = "synthetic"
    X = np.asarray(X, np.float32)
    Y = np.asarray(Y, np.float32)
    X_te = np.asarray(X_te, np.float32)
    Y_te = np.asarray(Y_te, np.float32)
    N = X.shape[0]

    Z0 = kmeans_centers(X[:200000], args.M, n_init=1)
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = M.TGPSpec(Dy=1, Dx=X.shape[1], M=args.M, N=float(N),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1, quad_points=100),
                     flow=fspec, min_var=1e-8, remat=False,
                     fast_solves=args.fast_solves,
                     solve_precision=args.solve_precision)
    params = M.init_tgp_params(spec, X[:10000], Z0, variance_scale=1e-5,
                               kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
                               flow_inits=finits)

    loaders = [DataLoader(ArrayDataset(X, Y), args.batch, seed=0),
               DataLoader(ArrayDataset(X_te, Y_te), args.batch,
                          shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=20)
    steps_per_epoch = N // args.batch

    if args.checkpoints:
        cps = [int(c) for c in args.checkpoints.split(",")]
        done, wall = 0, 0.0
        for cp in cps:
            t0 = time.time()
            tr.train(cp - done, 0.01, "adam", verbose_each=0,
                     natgrad_gamma=args.natgrad,
                     natgrad_warmup=args.natgrad_warmup)
            wall += time.time() - t0
            done = cp
            m = tr._metrics_for_loader(tr.test_loader)
            print(json.dumps({
                "source": src, "rows": N, "M": args.M, "batch": args.batch,
                "gamma": args.natgrad, "warmup": args.natgrad_warmup,
                "epoch": cp,
                "train_wall_s": round(wall, 2),
                "test_nll": round(float(-m["logL"][0]), 4),
                "test_rmse": round(float(m["rmse"][0]), 4),
                "final_elbo": round(float(tr.loss_curve[-1]), 2),
            }), flush=True)
        return

    t0 = time.time()
    tr.train(1, 0.01, "adam", verbose_each=0,
             natgrad_gamma=args.natgrad,
             natgrad_warmup=args.natgrad_warmup)   # includes compile
    compile_epoch = time.time() - t0
    t0 = time.time()
    tr.train(args.epochs, 0.01, "adam", verbose_each=0,
             natgrad_gamma=args.natgrad,
             natgrad_warmup=args.natgrad_warmup)
    dt = time.time() - t0
    sps = args.epochs * steps_per_epoch / dt
    elbo = float(tr.loss_curve[-1])
    print(json.dumps({
        "source": src, "rows": N, "M": args.M, "batch": args.batch,
        "gamma": args.natgrad,
        "solves": ("fast_" + args.solve_precision if args.fast_solves
                   else "trsm_" + args.solve_precision),
        "steps_per_sec": round(sps, 1),
        "rows_per_sec": round(sps * args.batch, 0),
        "epoch_sec": round(dt / args.epochs, 2),
        "first_epoch_incl_compile_sec": round(compile_epoch, 1),
        "final_elbo": elbo,
    }))


if __name__ == "__main__":
    main()
