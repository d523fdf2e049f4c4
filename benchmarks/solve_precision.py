"""Mixed-precision solve experiment (VERDICT r2 item 4).

The large-M roofline (PARITY.md) shows the factor APPLICATIONS (L^{-1}
K_zx and the K_xz projections) dominating the forward at 42% of a
6x-derated ceiling: every contraction inherits the global 'highest'
matmul precision that only the near-singular K_zz Cholesky actually
needs.  `spec.solve_precision` (models/tgp.py) splits precision at the
factorize/apply boundary; this benchmark measures what that buys and
what it costs:

  * throughput: full train step (grad+adam), scan-compiled, arms =
    trsm/highest (production default), fast/highest, fast/high (bf16x3),
    fast/default (single bf16 pass, fp32 accum), at power/mid/large
    shapes;
  * accuracy: per-arm ELBO at the benchmark point, plus (--nll) the real
    power M=100 SAL x2 15000-epoch protocol NLL per arm vs the measured
    torch-replica denominator (results_torch_replica.jsonl: 2.7965).

Usage: python benchmarks/solve_precision.py [--platform cpu] [--nll]
Emits one JSON line per (config, arm).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ARMS = [  # (label, fast_solves, solve_precision)
    ("trsm_highest", False, "highest"),
    ("fast_highest", True, "highest"),
    ("fast_high", True, "high"),
    ("fast_default", True, "default"),
]


def _build(N, M, Dy, Dx, quad, fast, prec, X=None, Y=None):
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    if X is None:
        rng = np.random.RandomState(0)
        X = np.asarray(rng.randn(N, Dx), np.float32)
        Y = np.asarray(rng.randn(N, Dy), np.float32)
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = Mm.TGPSpec(Dy=Dy, Dx=Dx, M=M, N=float(N),
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("gaussian_flow", Dy,
                                                quad_points=quad),
                      flow=fspec, fast_solves=fast, solve_precision=prec)
    params = Mm.init_tgp_params(
        spec, X, X[:M].copy(), variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=finits)
    return spec, params, X, Y


def bench(N, M, Dy, Dx, quad, fast, prec, chunk=100):
    import jax
    import jax.numpy as jnp
    import optax
    from tgp.pytorch_tpu.models import tgp as Mm

    spec, params, X, Y = _build(N, M, Dy, Dx, quad, fast, prec)
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


def nll_protocol(fast, prec, epochs=15000, platform=None):
    """The real power M=100 SAL x2 cell — the EXACT experiments/main.py
    protocol (same flags a user would pass) under the given solve mode.
    Returns (test NLL, RMSE, wall seconds)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__),
                                    "..", "experiments"))
    import main as exp_main

    args = exp_main.parse_args([
        "--model", "TGP", "--dataset", "power",
        "--train_test_seed_split", "1", "--num_inducing", "100",
        "--epochs", str(epochs), "--precision", "fp32",
        "--verbose_each", "0",
        "--solve_precision", prec] + (["--fast_solves"] if fast else [])
        + (["--platform", platform] if platform else []))
    t0 = time.time()
    m = exp_main.run(args)["test"]
    return -float(np.mean(m["logL"])), float(np.mean(m["rmse"])), \
        time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--nll", action="store_true",
                    help="also run the full power M=100 protocol per arm")
    ap.add_argument("--skip_bench", action="store_true",
                    help="skip the throughput arms (only --nll runs)")
    ap.add_argument("--epochs", type=int, default=15000)
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
    if args.skip_bench:
        configs = []
    for name, N, M, Dy, Dx, quad, chunk in configs:
        base = None
        for label, fast, prec in ARMS:
            sps, elbo = bench(N, M, Dy, Dx, quad, fast, prec, chunk)
            base = base or sps
            print(json.dumps({"config": name, "arm": label,
                              "steps_per_s": round(sps, 1),
                              "speedup_vs_trsm": round(sps / base, 3),
                              "elbo": round(elbo, 4)}), flush=True)
    if args.nll:
        for label, fast, prec in ARMS:
            nll, rmse, wall = nll_protocol(fast, prec, args.epochs,
                                           platform=args.platform)
            print(json.dumps({"protocol": "power_M100_SALx2", "arm": label,
                              "epochs": args.epochs,
                              "test_nll": round(nll, 4),
                              "test_rmse": round(rmse, 4),
                              "wall_s": round(wall, 1)}), flush=True)


if __name__ == "__main__":
    main()
