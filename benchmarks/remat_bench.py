"""Measure TGPSpec.remat: peak HBM + steps/s A/B (round-4 verdict item 4).

`remat` (models/tgp.py) rematerializes the marginal-qf + quadrature pipeline
in the backward pass instead of keeping the (M, MB) solve and (S, Dy, MB)
quadrature intermediates alive.  This script runs ONE (M, batch, remat) arm
per process — `jax.Device.memory_stats()['peak_bytes_in_use']` is cumulative
per process, so arms must not share one — and prints one JSON line:

    python benchmarks/remat_bench.py --M 500 --batch 10000 --remat 1

`tools/run_remat_ab.sh` drives the full A/B grid (the airline M=500
batch-10000 cell, the large M=512 cell, and the max-trainable-batch
frontier) into results_remat.jsonl.  A probe that OOMs prints
{"status": "oom"} and exits 0 so the driver can walk past the frontier.
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
    p.add_argument("--M", type=int, default=500)
    p.add_argument("--batch", type=int, default=10000)
    p.add_argument("--rows", type=int, default=None,
                   help="training rows (default: 20 steps per epoch)")
    p.add_argument("--remat", type=int, choices=[0, 1], required=True)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--quad", type=int, default=100)
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    import numpy as np
    import jax
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.data import kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    rows = args.rows or max(20 * args.batch, 40000)
    rng = np.random.RandomState(0)
    X = np.asarray(rng.randn(rows, 8), np.float32)
    Y = np.asarray(np.sin(X[:, :1]) + 0.3 * X[:, 1:2] * X[:, 2:3]
                   + 0.3 * rng.randn(rows, 1), np.float32)

    Z0 = kmeans_centers(X[:50000], args.M, n_init=1)
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = M.TGPSpec(Dy=1, Dx=8, M=args.M, N=float(rows),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1,
                                               quad_points=args.quad),
                     flow=fspec, min_var=1e-8, remat=bool(args.remat))
    params = M.init_tgp_params(spec, X[:10000], Z0, variance_scale=1e-5,
                               kernel_init={"length_scale": 2.0,
                                            "kernel_scale": 2.0},
                               flow_inits=finits)
    loaders = [DataLoader(ArrayDataset(X, Y), args.batch, seed=0),
               DataLoader(ArrayDataset(X[:2000], Y[:2000]), 2000,
                          shuffle=False)]
    steps_per_epoch = rows // args.batch

    rec = {"M": args.M, "batch": args.batch, "rows": rows,
           "quad": args.quad, "remat": bool(args.remat)}
    try:
        tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=10)
        tr.train(1, 0.01, "adam", verbose_each=0)        # compile + 1 epoch
        t0 = time.time()
        tr.train(args.epochs, 0.01, "adam", verbose_each=0)
        dt = time.time() - t0
        elbo = float(tr.loss_curve[-1])
        rec.update(status="ok",
                   steps_per_sec=round(args.epochs * steps_per_epoch / dt, 2),
                   final_elbo=round(elbo, 2))
    except Exception as e:     # RESOURCE_EXHAUSTED etc: report, exit 0
        msg = str(e)
        rec.update(status="oom" if ("RESOURCE_EXHAUSTED" in msg
                                    or "Out of memory" in msg
                                    or "exceeds the memory" in msg)
                   else "error",
                   error=msg.splitlines()[0][:200])
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    if peak is not None:
        rec["peak_hbm_mb"] = round(peak / 2 ** 20, 1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
