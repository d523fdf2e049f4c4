"""A/B benchmark for spec.fast_solves (explicit L^{-1} GEMM vs trsm).

Motivation: the roofline (benchmarks/roofline.py, PARITY.md) measured the
whitened-marginal triangular-solve stage at ~42% of the fp32 matmul
ceiling — trsm's sequential back-substitution cannot tile onto the MXU the
way a GEMM does.  `spec.fast_solves=True` (models/tgp.py:314) instead
inverts L once per step against the identity (one trsm on an (M,M) RHS)
and turns both solves into GEMMs.  This measures whether that trade wins
on real shapes, to decide the default.

Times the FULL training step (grad+adam), scan-compiled (the production
fast path), on power-size and large configs.

Usage: python benchmarks/fast_solves_bench.py [--platform cpu]
Emits one JSON line per (config, mode).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench(N, M, Dy, Dx, quad, fast, chunk=100):
    import jax
    import jax.numpy as jnp
    import optax
    from tgp.pytorch_tpu import config as cfg
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    rng = np.random.RandomState(0)
    X = np.asarray(rng.randn(N, Dx), np.float32)
    Y = np.asarray(rng.randn(N, Dy), np.float32)
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = Mm.TGPSpec(Dy=Dy, Dx=Dx, M=M, N=float(N),
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("gaussian_flow", Dy,
                                                quad_points=quad),
                      flow=fspec, fast_solves=fast)
    params = Mm.init_tgp_params(
        spec, X, X[:M].copy(), variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=finits)
    opt = optax.adam(0.01)
    opt_state = opt.init(params)
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)

    @jax.jit
    def run(p, s):
        def body(carry, _):
            p, s = carry
            g = jax.grad(lambda pp: -Mm.elbo(spec, pp, Xd, Yd)[0])(p)
            u, s2 = opt.update(g, s, p)
            return (optax.apply_updates(p, u), s2), None
        (p, s), _ = jax.lax.scan(body, (p, s), None, length=chunk)
        return p, s

    params, opt_state = run(params, opt_state)
    jax.block_until_ready(params)
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        params, opt_state = run(params, opt_state)
        jax.block_until_ready(params)
        best = max(best, chunk / (time.perf_counter() - t0))
    elbo = float(Mm.elbo(spec, params, Xd, Yd)[0])
    return best, elbo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")

    configs = [
        ("power_M100", 8611, 100, 1, 4, 100, 200),
        ("mid_M256", 16384, 256, 1, 8, 100, 100),
        ("large_M512", 65536, 512, 1, 8, 100, 25),
    ]
    for name, N, M, Dy, Dx, quad, chunk in configs:
        out = {}
        for fast in (False, True):
            sps, elbo = bench(N, M, Dy, Dx, quad, fast, chunk)
            out["fast" if fast else "trsm"] = sps
            out["elbo_" + ("fast" if fast else "trsm")] = elbo
        out["speedup"] = out["fast"] / out["trsm"]
        print(json.dumps({"config": name, **{k: round(v, 4) for k, v in out.items()}}), flush=True)


if __name__ == "__main__":
    main()
