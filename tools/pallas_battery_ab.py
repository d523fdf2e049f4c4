"""A/B the vmapped Pallas RBF Gram against the jnp expansion on a
battery-shaped workload (10-seed vmapped TGP full-batch training, power-like
shapes), on the real TPU.  Run when the chip is otherwise idle; prints one
JSON line per arm plus the speedup.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(epochs=500):
    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu
    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.train import multiseed as ms

    R, N, Dx, Mind, Dy = 10, 8192, 4, 100, 1
    rng = np.random.RandomState(0)
    Xtr = rng.randn(R, N, Dx).astype(np.float32)
    Ytr = rng.randn(R, N, Dy).astype(np.float32)

    flow_spec, flow_inits = spec_from_list(G.SAL(2))
    lik = LikelihoodSpec("gaussian_flow", Dy, noise_is_shared=False,
                         quad_points=cfg.quad_points)
    spec = M.TGPSpec(Dy=Dy, Dx=Dx, M=Mind, N=float(N),
                     kernel=K.from_name("scale_rbf"), likelihood=lik,
                     flow=flow_spec, mean="zero", whiten=True)

    per_seed = []
    for r in range(R):
        Z0 = Xtr[r][rng.choice(N, Mind, replace=False)]
        per_seed.append(M.init_tgp_params(
            spec, Xtr[r], Z0, variance_scale=1e-5, mean_scale=0.0,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0,
                         "noisy_variance": 1e-6},
            noise_init=0.05, flow_inits=flow_inits))
    stack0 = ms.stack_trees(per_seed)

    def run(n):
        stack = jtu.tree_map(jnp.array, stack0)   # fresh copy (donation)
        t0 = time.time()
        p, curves = ms.train_multiseed(spec, stack, Xtr, Ytr, epochs=n,
                                       lr=0.01, chunk=n)
        jax.block_until_ready(p)
        return time.time() - t0, curves

    def timed(arm):
        # two-length differencing: compile + dispatch cost cancels (scan
        # body traces once regardless of length — CLAUDE.md microbenchmark
        # recipe); per-epoch time = (t_long - t_short) / (n_long - n_short).
        # Each length runs twice and keeps the min: the very first compile
        # of a session is much colder than later ones (XLA compile cache),
        # which would otherwise make the difference negative.
        n_short, n_long = 100, 100 + epochs
        t_s = min(run(n_short)[0], run(n_short)[0])
        t_l1, curves = run(n_long)
        t_l = min(t_l1, run(n_long)[0])
        dt = t_l - t_s
        if dt <= 0:
            print(json.dumps({"arm": arm, "warning": "non-positive diff",
                              "t_short": t_s, "t_long": t_l}))
            return None
        print(json.dumps({"arm": arm, "epochs": epochs, "R": R, "N": N,
                          "M": Mind, "wall_s": round(dt, 3),
                          "eff_steps_per_s": round(R * epochs / dt, 1),
                          "final_elbo_mean": float(
                              np.mean(curves["elbo"][-1]))}))
        return dt

    dt_pallas = timed("pallas_vmap")
    K.USE_PALLAS = False
    dt_jnp = timed("jnp_fallback")
    if dt_pallas and dt_jnp:
        print(json.dumps({"speedup_pallas_over_jnp":
                          round(dt_jnp / dt_pallas, 3)}))
    else:
        print(json.dumps({"warning": "speedup skipped: a timing arm had a "
                          "non-positive two-length difference"}))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 500)
