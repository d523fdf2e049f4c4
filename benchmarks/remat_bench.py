"""Measure TGPSpec.remat: peak-HBM + steps/s A/B (round-4 verdict item 4).

`remat` (models/tgp.py) rematerializes the marginal-qf + quadrature pipeline
in the backward pass instead of keeping the (M, MB) solve and (S, Dy, MB)
quadrature intermediates alive.  ONE process measures every arm:

  * peak HBM per arm comes from XLA's own allocation plan for the
    scan-compiled 50-step training program (`compiled.memory_analysis()`:
    argument + output + temp bytes) — exact for the executable that real
    training runs, and immune to the cumulative-per-process skew of
    `Device.memory_stats()['peak_bytes_in_use']`,
  * steps/s from timing the same compiled chunk (2nd call, post-compile),
  * the max-trainable-batch frontier from attempting execution of the
    largest arms (an OOM is caught and recorded; arms run smallest-first).

    python benchmarks/remat_bench.py [--arms 500x10000,512x20000,...]
        [--out results_remat.jsonl]
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
    p.add_argument("--arms", default="500x10000,512x20000,500x50000,"
                              "500x100000,500x200000,500x400000",
                   help="comma-separated MxBATCH arms, run smallest-first "
                        "each with remat off/on")
    p.add_argument("--chunk", type=int, default=50,
                   help="steps per scan-compiled chunk (the Trainer's "
                        "training-program shape)")
    p.add_argument("--quad", type=int, default=100)
    p.add_argument("--platform", default=None)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    print(f"devices: {jax.devices()}", flush=True)   # early liveness line
    arms = []
    for a in args.arms.split(","):
        m, b = a.split("x")
        arms.append((int(m), int(b)))
    arms.sort(key=lambda mb: mb[0] * mb[1])

    out_f = open(args.out, "a") if args.out else None

    def emit(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()

    rng0 = np.random.RandomState(0)
    Dx = 8
    for M_ind, batch in arms:
        X = np.asarray(rng0.randn(batch, Dx), np.float32)
        Y = np.asarray(np.sin(X[:, :1]) + 0.3 * X[:, 1:2] * X[:, 2:3]
                       + 0.3 * rng0.randn(batch, 1), np.float32)
        Z0 = X[:M_ind] if batch >= M_ind else np.asarray(
            rng0.randn(M_ind, Dx), np.float32)
        for remat in (False, True):
            np.random.seed(0)
            fspec, finits = spec_from_list(G.SAL(2))
            spec = M.TGPSpec(
                Dy=1, Dx=Dx, M=M_ind, N=float(batch * 20),
                kernel=K.from_name("scale_rbf"),
                likelihood=LikelihoodSpec("gaussian_flow", 1,
                                          quad_points=args.quad),
                flow=fspec, min_var=1e-8, remat=remat)
            params = M.init_tgp_params(
                spec, X[:10000], Z0, variance_scale=1e-5,
                kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
                flow_inits=finits)
            optimizer = optax.adam(0.01)
            opt_state = optimizer.init(params)
            Xd, Yd = jnp.asarray(X), jnp.asarray(Y)

            def body(carry, _):
                pp, oo, r = carry
                r, sub = jax.random.split(r)

                def loss(q):
                    e, ell, kld = M.elbo(spec, q, Xd, Yd, sub)
                    return -e

                g = jax.grad(loss)(pp)
                up, oo = optimizer.update(g, oo, pp)
                pp = optax.apply_updates(pp, up)
                return (pp, oo, r), 0.0

            def chunk(pp, oo, r):
                (pp, oo, r), _ = jax.lax.scan(body, (pp, oo, r), None,
                                              length=args.chunk)
                return pp, oo, r

            rec = {"M": M_ind, "batch": batch, "quad": args.quad,
                   "remat": remat, "chunk": args.chunk}
            try:
                lowered = jax.jit(chunk).lower(params, opt_state,
                                               jax.random.PRNGKey(0))
                compiled = lowered.compile()
                ma = compiled.memory_analysis()
                peak = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                        + ma.temp_size_in_bytes)
                rec.update(
                    hbm_args_mb=round(ma.argument_size_in_bytes / 2**20, 1),
                    hbm_temp_mb=round(ma.temp_size_in_bytes / 2**20, 1),
                    hbm_total_mb=round(peak / 2**20, 1))
                p1, o1, r1 = compiled(params, opt_state, jax.random.PRNGKey(0))
                jax.block_until_ready(p1)
                t0 = time.time()
                p1, o1, r1 = compiled(p1, o1, r1)
                jax.block_until_ready(p1)
                dt = time.time() - t0
                rec.update(status="ok",
                           steps_per_sec=round(args.chunk / dt, 2))
            except Exception as e:
                msg = str(e)
                rec.update(status="oom" if ("RESOURCE_EXHAUSTED" in msg
                                            or "Out of memory" in msg
                                            or "exceeds the memory" in msg)
                           else "error",
                           error=msg.splitlines()[0][:200])
            emit(rec)
    if out_f:
        out_f.close()


if __name__ == "__main__":
    main()
