"""Serving latency/throughput benchmark for `tgp.pytorch_tpu.serve.Predictor`.

The reference has no deployment story (its eval re-enters the training
loop's python paths, reference: code/dsp/trainers/trainers_regression.py:
108-155); `serve.Predictor` is the production path here: compile-once
bucketed programs, no host round-trips inside a request.  This benchmark
measures what a serving SLO cares about, end to end (dispatch + compute +
device->host transfer, i.e. what a caller of `predict()` actually waits):

  * dispatch floor — p50 wall of a trivial jitted op, so the tunnel/runtime
    fixed cost (CLAUDE.md: ~0.5-2 ms/dispatch on this host) is separable
    from model compute in every number below,
  * cold-compile wall per bucket (first request pays XLA compilation),
  * warm p50/p95 latency for a small request (n=32, padded to the small
    bucket) and a full large-bucket request (n=4096),
  * throughput (rows/s) at the large bucket,
  * the same for bands-only requests (device-side S=200 quantiles, one
    fetch), raw-sample requests (S=200 samples cross to the host), and the
    fully-Bayesian MC-dropout arm (S_MC=100 dropout draws per request).

Arms: TGP (SAL 2, the power table arch) and ID_TGP (MC-dropout hypernet
SAL 3, the power ID arch) at M=100, Dx=4, quad=100 — the flagship
benchmark shapes.  Emits one JSON line per measurement.

Usage:  python benchmarks/serving.py [--platform cpu] [--reps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def p50_p95(ts):
    q = np.quantile(np.asarray(ts), [0.5, 0.95])
    return float(q[0]), float(q[1])


def bench_predictor(name, pred, Xq_small, Xq_large, reps, samples=0,
                    quantiles=None):
    res = []
    # cold compile: first call per bucket
    t0 = time.perf_counter()
    pred.predict(Xq_small, samples=samples, quantiles=quantiles)
    cold_small = time.perf_counter() - t0
    t0 = time.perf_counter()
    pred.predict(Xq_large, samples=samples, quantiles=quantiles)
    cold_large = time.perf_counter() - t0
    res.append({"arm": name, "what": "cold_compile_s",
                "small_bucket": round(cold_small, 3),
                "large_bucket": round(cold_large, 3)})

    for label, Xq, r in (("small_n32", Xq_small, reps),
                         ("large_n4096", Xq_large, max(reps // 3, 5))):
        ts = []
        for _ in range(r):
            t0 = time.perf_counter()
            pred.predict(Xq, samples=samples, quantiles=quantiles)
            ts.append(time.perf_counter() - t0)
        p50, p95 = p50_p95(ts)
        rec = {"arm": name, "what": f"warm_latency_{label}", "reps": r,
               "p50_ms": round(p50 * 1e3, 3), "p95_ms": round(p95 * 1e3, 3)}
        if label.startswith("large"):
            rec["rows_per_sec"] = round(Xq.shape[0] / p50)
        res.append(rec)
    for r in res:
        print(json.dumps(r), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--skip_bayesian", action="store_true")
    args = ap.parse_args()

    from tgp.pytorch_tpu import config as cfg
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    cfg.set_precision("fp32")

    import jax
    import jax.numpy as jnp
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.serve import Predictor

    print(json.dumps({"platform": jax.devices()[0].platform,
                      "device": str(jax.devices()[0])}), flush=True)

    # dispatch floor: trivial jitted op, dispatch+transfer only
    tiny = jax.jit(lambda x: x + 1.0)
    z = jnp.zeros((8,), jnp.float32)
    np.asarray(tiny(z))
    ts = []
    for _ in range(30):
        t0 = time.perf_counter()
        np.asarray(tiny(z))
        ts.append(time.perf_counter() - t0)
    p50, p95 = p50_p95(ts)
    print(json.dumps({"what": "dispatch_floor", "p50_ms": round(p50 * 1e3, 3),
                      "p95_ms": round(p95 * 1e3, 3)}), flush=True)

    rng = np.random.RandomState(0)
    Dx, Mind, Dy = 4, 100, 1
    X = rng.randn(2048, Dx)
    Xq_small = rng.randn(32, Dx)
    Xq_large = rng.randn(4096, Dx)
    buckets = (256, 4096)

    # ---- TGP arm: SAL 2 (power table arch), quad 100 ---------------------
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = M.TGPSpec(Dy=Dy, Dx=Dx, M=Mind, N=float(X.shape[0]),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", Dy,
                                               quad_points=100),
                     flow=fspec)
    params = M.init_tgp_params(spec, X, X[:Mind], flow_inits=finits,
                               kernel_init={"length_scale": 2.0,
                                            "kernel_scale": 2.0},
                               noise_init=0.05)
    pred = Predictor(spec, params, Y_std=2.0, Y_mean=1.0, buckets=buckets)
    bench_predictor("TGP_moments", pred, Xq_small, Xq_large, args.reps)

    # sustained QPS: pipelined map vs sequential predicts (n=32 moments)
    reqs = [Xq_small] * args.reps
    pred.map(reqs[:2], quantiles=None)          # warm
    t0 = time.perf_counter()
    pred.map(reqs, quantiles=None)
    t_map = time.perf_counter() - t0
    t0 = time.perf_counter()
    for r in reqs:
        pred.predict(r, quantiles=None)
    t_seq = time.perf_counter() - t0
    print(json.dumps({"arm": "TGP_moments", "what": "sustained_qps_n32",
                      "requests": len(reqs),
                      "map_qps": round(len(reqs) / t_map, 1),
                      "sequential_qps": round(len(reqs) / t_seq, 1),
                      "pipelining_speedup": round(t_seq / t_map, 2)}),
          flush=True)
    bench_predictor("TGP_bands_only", pred, Xq_small, Xq_large, args.reps,
                    quantiles=(0.025, 0.975))
    bench_predictor("TGP_samples_S200", pred, Xq_small, Xq_large,
                    args.reps, samples=200, quantiles=(0.025, 0.975))

    # ---- ID_TGP arm: MC-dropout hypernet SAL 3 (power ID arch) -----------
    if not args.skip_bayesian:
        np.random.seed(0)
        fl = G.SAL(3, input_dependent=True, input_dim=Dx, hidden_dim=50,
                   num_hidden_layers=2, dropout=0.25,
                   hidden_activation="relu")
        fspec_id, finits_id = spec_from_list(fl)
        import dataclasses
        spec_id = dataclasses.replace(spec, flow=fspec_id)
        params_id = M.init_tgp_params(spec_id, X, X[:Mind],
                                      flow_inits=finits_id,
                                      kernel_init={"length_scale": 2.0,
                                                   "kernel_scale": 2.0},
                                      noise_init=0.05)
        pred_id = Predictor(spec_id, params_id, Y_std=2.0, Y_mean=1.0,
                            buckets=buckets, fully_bayesian=True, S_MC=100)
        bench_predictor("ID_TGP_bayes_S100_moments", pred_id, Xq_small,
                        Xq_large, max(args.reps // 2, 10))


if __name__ == "__main__":
    main()
