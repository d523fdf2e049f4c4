"""Multi-process (multi-host / DCN) training worker.

One copy of this script runs per process; together they form a jax
cluster and train a TGP dp-sharded across every device of every process
through the ordinary `Trainer` API (parallel/multihost.py does the
placement).  On a real TPU pod, `initialize` needs no explicit arguments;
here the CPU test cluster (gloo collectives, virtual devices) exercises
the identical code path — this is how tests/test_multihost.py validates
multi-host training without pod hardware.

Prints one JSON line: final ELBO, a parameter checksum (must agree across
processes — the global arrays are the same program state), and a locally
computed test NLL from the fetched parameters.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--local_devices", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch_size", type=int, default=0,
                    help="0 = full batch")
    ap.add_argument("--N", type=int, default=256)
    ap.add_argument("--M", type=int, default=8)
    ap.add_argument("--Dy", type=int, default=1)
    ap.add_argument("--ty", type=int, default=1,
                    help="output-parallel axis size (stays intra-host)")
    ap.add_argument("--natgrad", type=float, default=None,
                    help="natural-gradient VI gamma (train/natgrad.py)")
    args = ap.parse_args()

    from tgp.pytorch_tpu.parallel import multihost as mh
    mh.initialize(f"localhost:{args.port}", args.num_processes,
                  args.process_id, platform="cpu",
                  local_device_count=args.local_devices)

    import jax
    import numpy as np
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.train.trainer import Trainer

    # identical seeded data in every process (host-replicated load, the
    # committed-pickle analog)
    rng = np.random.RandomState(0)
    X = np.asarray(rng.randn(args.N, 3), np.float32)
    W = rng.randn(3, args.Dy)
    Y = np.asarray(np.sinh(0.8 * X @ W) + 0.1 * rng.randn(args.N, args.Dy),
                   np.float32)
    Xte = np.asarray(rng.randn(64, 3), np.float32)
    Yte = np.asarray(np.sinh(0.8 * Xte @ W) + 0.1 * rng.randn(64, args.Dy),
                     np.float32)

    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = Mm.TGPSpec(
        Dy=args.Dy, Dx=3, M=args.M, N=float(args.N),
        kernel=K.from_name("scale_rbf"),
        likelihood=LikelihoodSpec("gaussian_flow", args.Dy, quad_points=20),
        flow=fspec)
    params = Mm.init_tgp_params(
        spec, X, X[:args.M].copy(), variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=finits)

    mesh = mh.global_mesh(ty=args.ty)    # dp crosses processes (DCN tier)
    bs = args.batch_size or args.N
    loaders = [DataLoader(ArrayDataset(X, Y), bs, seed=7),
               DataLoader(ArrayDataset(Xte, Yte), bs, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(args.Dy), seed=3,
                 mesh=mesh)
    tr.train(args.epochs, 0.01, "adam", verbose_each=0,
             natgrad_gamma=args.natgrad)

    final_elbo = float(tr.loss_curve[-1])
    # distributed evaluation: every process evaluates its row shard, the
    # accumulators cross-process psum (Trainer._compute_metrics_multihost)
    mh_metrics = tr.compute_metrics()
    # dp-replicated / ty-sharded params are fully fetchable per process
    host_params = mh.fetch_params(tr.params)
    leaves = jax.tree_util.tree_leaves(host_params)
    h = hashlib.md5()
    for lf in leaves:
        h.update(np.ascontiguousarray(lf).tobytes())
    # local eval from the fetched parameters (no mesh): the multi-host
    # train -> single-host serve workflow
    nll = -float(np.mean(np.asarray(
        Mm.test_log_likelihood(spec, host_params, Xte, Yte,
                               Y_std=np.ones(args.Dy)))))
    print(json.dumps({
        "process": args.process_id,
        "devices": len(jax.devices()),
        "elbo": round(final_elbo, 4),
        "param_md5": h.hexdigest(),
        "test_nll": round(nll, 4),
        "mh_logL": np.round(mh_metrics["test"]["logL"], 6).tolist(),
        "mh_rmse": np.round(mh_metrics["test"]["rmse"], 6).tolist(),
        "mh_coverage": np.round(mh_metrics["test"]["coverage"], 6).tolist(),
    }), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
