"""Quickstart: train a TGP on UCI boston and serve predictions.

    python examples/quickstart.py [--platform cpu] [--epochs 2000]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--platform", default=None)
    p.add_argument("--epochs", type=int, default=2000)
    args = p.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from tgp.pytorch_tpu import config as cfg
    cfg.set_precision("fp32")

    import numpy as np
    from tgp.pytorch_tpu import (TGPSpec, init_tgp_params, Trainer, Predictor,
                                 LikelihoodSpec, return_dataset, kmeans_centers)
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.train.checkpoint import save_checkpoint, load_checkpoint
    from tgp.pytorch_tpu.models.serialization import spec_to_json

    # 1. data: the reference's committed boston split (seed 1), z-scored
    loaders, dc = return_dataset("boston", 10000, None, seed=1)

    # 2. model: TGP with a 2-block SAL marginal flow
    np.random.seed(0)
    flow, flow_inits = spec_from_list(G.SAL(2))
    spec = TGPSpec(Dy=dc["Dy"], Dx=dc["Dx"], M=50, N=float(dc["N_tr"]),
                   kernel=K.from_name("scale_rbf"),
                   likelihood=LikelihoodSpec("gaussian_flow", dc["Dy"],
                                             quad_points=100),
                   flow=flow)
    params = init_tgp_params(
        spec, dc["X_tr"], kmeans_centers(dc["X_tr"], 50, n_init=10),
        variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=flow_inits)

    # 3. train (scan-compiled: thousands of epochs per device call)
    trainer = Trainer(spec, params, loaders, dc["Y_std"], S_test=100)
    trainer.train(args.epochs, 0.01, "adam", verbose_each=500)
    metrics = trainer.compute_metrics()
    print("test:", {k: np.round(v, 3) for k, v in metrics["test"].items()})

    # 4. checkpoint (params + JSON spec)
    ckpt = save_checkpoint("checkpoints/quickstart", trainer.params,
                           step=args.epochs, extra={"spec": spec_to_json(spec)})
    print("checkpoint:", ckpt)

    # 5. serve: compile-once bucketed predictions in the original data scale
    predictor = Predictor(spec, trainer.params, Y_std=dc["Y_std"],
                          Y_mean=dc["Y_mean"], buckets=(128,))
    out = predictor.predict(dc["X_tr"][:10], samples=100)
    print("predictive mean:", np.round(out["mean"][0], 2))
    print("95% band low   :", np.round(out["lower"][0], 2))
    print("95% band high  :", np.round(out["upper"][0], 2))


if __name__ == "__main__":
    main()
