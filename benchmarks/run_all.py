"""Extended benchmark table (beyond the driver's single bench.py line).

    python benchmarks/run_all.py [--platform tpu|cpu]

Measures scan-compiled training throughput and evaluation latency for the
reference's headline configs plus a production-scale config, printing a
JSON line per row.
"""

from __future__ import annotations

import argparse
import json
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def bench_config(name, N, Dx, M, quad, flow_blocks, steps=400, chunk=200,
                 id_hp=None):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.flows.core import IDENTITY_SPEC

    rng = np.random.RandomState(0)
    X = rng.randn(N, Dx).astype(np.float32)
    Y = rng.randn(N, 1).astype(np.float32)
    if id_hp is not None:
        # input-dependent (hypernet) flows — the paper's flagship ID_TGP,
        # reference exp_config defaults (MC-dropout MLP hypernets)
        np.random.seed(0)
        fl = G.SAL(flow_blocks, input_dependent=True, input_dim=Dx,
                   num_hidden_layers=id_hp["flow_num_hidden_layers"],
                   batch_norm=id_hp["flow_BN"], dropout=id_hp["flow_DR"],
                   hidden_dim=id_hp["flow_hidden_dim"],
                   hidden_activation=id_hp["flow_hidden_act"],
                   inference=id_hp["flow_inference"])
        fspec, finits = spec_from_list(fl)
        lik = LikelihoodSpec("gaussian_flow", 1, quad_points=quad)
    elif flow_blocks:
        np.random.seed(0)
        fspec, finits = spec_from_list(G.SAL(flow_blocks))
        lik = LikelihoodSpec("gaussian_flow", 1, quad_points=quad)
    else:
        fspec, finits = IDENTITY_SPEC, None
        lik = LikelihoodSpec("gaussian", 1)
    spec = Mm.TGPSpec(Dy=1, Dx=Dx, M=M, N=float(N), kernel=K.from_name("scale_rbf"),
                      likelihood=lik, flow=fspec, min_var=1e-8)
    params = Mm.init_tgp_params(spec, X, X[:M].copy(), variance_scale=1e-5,
                                kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
                                flow_inits=finits)
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    opt = optax.adam(0.01)
    s = opt.init(params)

    stochastic = id_hp is not None      # MC-dropout flows need a train rng

    from functools import partial

    @partial(jax.jit, static_argnums=(3,))
    def run_chunk(p, s, k, length):
        def body(c, _):
            p, s, k = c
            k, sub = jax.random.split(k)
            g = jax.grad(lambda pp: -Mm.elbo(
                spec, pp, Xd, Yd, sub if stochastic else None)[0])(p)
            u, s2 = opt.update(g, s, p)
            return (optax.apply_updates(p, u), s2, k), None
        (p, s, k), _ = jax.lax.scan(body, (p, s, k), None, length=length)
        return p, s, k

    from tgp.pytorch_tpu import config as _cfg
    key = _cfg.make_rng(0)          # honours cfg.set_rng_impl (rbg A/B)
    t0 = time.perf_counter()
    params, s, key = run_chunk(params, s, key, chunk)
    jax.block_until_ready(params)
    compile_s = time.perf_counter() - t0
    params, s, key = run_chunk(params, s, key, 2 * chunk)  # compile 2L too
    jax.block_until_ready(params)

    # two-scan-length differencing (CLAUDE.md): each dispatched program
    # carries a ~30 ms fixed tunnel cost, so dividing one window's wall
    # clock understates small configs ~2x.  T(2L) - T(L) over the same
    # number of dispatches cancels the fixed cost exactly.
    def timed(length, reps):
        nonlocal params, s, key
        t0 = time.perf_counter()
        for _ in range(reps):
            params, s, key = run_chunk(params, s, key, length)
        jax.block_until_ready(params)
        return time.perf_counter() - t0

    reps = max(2, steps // (3 * chunk))
    t1 = timed(chunk, reps)
    t2 = timed(2 * chunk, reps)
    if t2 > t1:
        train_sps = reps * chunk / (t2 - t1)
    else:                       # noise swamped the difference: fall back
        train_sps = reps * 3 * chunk / (t1 + t2)

    # eval latency: test-LL + predictive moments + 100 predictive samples
    eval_fn = jax.jit(lambda p, r: (
        Mm.test_log_likelihood(spec, p, Xd, Yd, jnp.ones(1)),
        Mm.predictive_distribution(spec, p, Xd)[0],
        Mm.sample_predictive(spec, p, Xd, 100, r)[0]))
    r = jax.random.PRNGKey(0)
    jax.block_until_ready(eval_fn(params, r))
    t0 = time.perf_counter()
    for _ in range(5):
        out = eval_fn(params, r)
    jax.block_until_ready(out)
    eval_ms = (time.perf_counter() - t0) / 5 * 1e3

    row = {"config": name, "N": N, "M": M, "quad": quad,
           "train_steps_per_sec": round(train_sps, 1),
           "eval_ms": round(eval_ms, 2),
           "compile_s": round(compile_s, 1)}

    if id_hp is not None:
        # fully-Bayesian eval (double-LSE over S_MC dropout draws) — the
        # reference's BA mode (sparse_MF_SP.py:764-768), S_MC=100
        ba_fn = jax.jit(lambda p, r: Mm.test_log_likelihood(
            spec, p, Xd, Yd, jnp.ones(1), S_MC=100, fully_bayesian=True,
            rng=r))
        jax.block_until_ready(ba_fn(params, r))
        t0 = time.perf_counter()
        for _ in range(5):
            out = ba_fn(params, r)
        jax.block_until_ready(out)
        row["eval_ba_s100_ms"] = round((time.perf_counter() - t0) / 5 * 1e3, 2)
    return row


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--rng_impl", default="threefry2x32",
                   choices=["threefry2x32", "rbg"],
                   help="training-draw PRNG; rbg = TPU hardware RNG "
                        "(reproduces PARITY.md's '693 steps/s with rbg' "
                        "ID_TGP row)")
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    cfg.set_rng_impl(args.rng_impl)

    rows = [
        bench_config("SVGP boston-size", 455, 13, 5, 0, 0),
        bench_config("SVGP power-size", 8611, 4, 100, 0, 0),
        bench_config("TGP power-size (SALx2, quad100)", 8611, 4, 100, 100, 2),
        bench_config("ID_TGP power-size (SALx3 MC-dropout hypernets)",
                     8611, 4, 100, 100, 3,
                     id_hp={"flow_num_hidden_layers": 2, "flow_BN": 0,
                            "flow_DR": 0.25, "flow_hidden_dim": 50,
                            "flow_hidden_act": "relu",
                            "flow_inference": "MC_dropout"}),
        bench_config("TGP large (M=512, N=65536)", 65536, 8, 512, 100, 2,
                     steps=100, chunk=50),
    ]
    for r in rows:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
