"""Attribute the ID_TGP (MC-dropout hypernet) train-step cost on TPU.

    python benchmarks/id_profile.py [--platform cpu]

Times the jitted ELBO train step (fwd+bwd+adam) for the power-size ID config
under three arms, two-scan-length differenced (dispatch cancels):

  * dropout=0.25, threefry keys (the default path)
  * dropout=0.0  (no bernoulli draws at all — isolates RNG cost)
  * dropout=0.25, rbg keys (TPU hardware RNG)

Prints one JSON line per arm.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def build(dr):
    import numpy as np
    import jax.numpy as jnp
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as Mm
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    N, Dx, M, quad = 8611, 4, 100, 100
    rng = np.random.RandomState(0)
    X = rng.randn(N, Dx).astype(np.float32)
    Y = rng.randn(N, 1).astype(np.float32)
    np.random.seed(0)
    fl = G.SAL(3, input_dependent=True, input_dim=Dx, num_hidden_layers=2,
               batch_norm=0, dropout=dr, hidden_dim=50,
               hidden_activation="relu", inference="MC_dropout")
    fspec, finits = spec_from_list(fl)
    lik = LikelihoodSpec("gaussian_flow", 1, quad_points=quad)
    spec = Mm.TGPSpec(Dy=1, Dx=Dx, M=M, N=float(N),
                      kernel=K.from_name("scale_rbf"), likelihood=lik,
                      flow=fspec, min_var=1e-8)
    params = Mm.init_tgp_params(spec, X, X[:M].copy(), variance_scale=1e-5,
                                kernel_init={"length_scale": 2.0,
                                             "kernel_scale": 2.0},
                                flow_inits=finits)
    return spec, params, jnp.asarray(X), jnp.asarray(Y)


def time_arm(name, dr, key_impl):
    import jax
    import jax.numpy as jnp
    import optax
    from tgp.pytorch_tpu.models import tgp as Mm

    spec, params, Xd, Yd = build(dr)
    opt = optax.adam(0.01)
    s = opt.init(params)
    key = jax.random.key(0, impl=key_impl)

    def chunk(n):
        @jax.jit
        def run(p, s, k):
            def body(c, _):
                p, s, k = c
                k, sub = jax.random.split(k)
                g = jax.grad(lambda pp: -Mm.elbo(spec, pp, Xd, Yd, sub)[0])(p)
                u, s2 = opt.update(g, s, p)
                return (optax.apply_updates(p, u), s2, k), None
            (p, s, k), _ = jax.lax.scan(body, (p, s, k), None, length=n)
            return p, s, k
        return run

    r_small, r_big = chunk(20), chunk(120)
    p1 = jax.block_until_ready(r_small(params, s, key))
    p2 = jax.block_until_ready(r_big(params, s, key))

    def t(run, reps=3):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(params, s, key))
            best = min(best, time.perf_counter() - t0)
        return best

    dt = t(r_big) - t(r_small)
    us = dt / 100 * 1e6
    print(json.dumps({"arm": name, "us_per_step": round(us, 1),
                      "steps_per_sec": round(1e6 / us, 1)}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    time_arm("dr=0.25 threefry", 0.25, "threefry2x32")
    time_arm("dr=0.0  threefry", 0.0, "threefry2x32")
    time_arm("dr=0.25 rbg", 0.25, "rbg")


if __name__ == "__main__":
    main()
