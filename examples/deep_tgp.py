"""Deep TGP example: a 2-layer stack on step-function data.

Deep GPs shine on non-stationary targets: the inner layer learns an input
warp so the outer (stationary-kernel) layer sees smooth data.  Compare the
test log-density against a shallow SVGP.

    python examples/deep_tgp.py [--platform cpu]
"""

import argparse
import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ap = argparse.ArgumentParser()
ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
args = ap.parse_args()
if args.platform:
    import jax
    jax.config.update("jax_platforms", args.platform)

import numpy as np
from tgp.pytorch_tpu import config as cfg

cfg.set_precision("fp64")  # small problem; fp64 keeps the S_train=1 gradient noise benign

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import (TGPSpec, init_tgp_params, DeepTGPSpec,
                                    layer_spec, init_deep_params)
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.train import Trainer

rng = np.random.RandomState(0)
N = 160
X = np.sort(rng.uniform(-2, 2, (N, 1)), axis=0)
Y = np.where(X > 0, 1.0, -1.0) + 0.05 * rng.randn(N, 1)
Xte = np.linspace(-2, 2, 200)[:, None]
Yte = np.where(Xte > 0, 1.0, -1.0)
kernel = K.from_name("scale_rbf")
loaders = lambda: [DataLoader(ArrayDataset(X, Y), 200, seed=0),
                   DataLoader(ArrayDataset(Xte, Yte), 200, shuffle=False)]

# shallow SVGP baseline
shallow = TGPSpec(Dy=1, Dx=1, M=16, N=float(N), kernel=kernel,
                  likelihood=LikelihoodSpec("gaussian", 1))
p = init_tgp_params(shallow, X, X[::10][:16], variance_scale=1e-5)
tr = Trainer(shallow, p, loaders(), Y_std=np.ones(1), S_test=50)
tr.train(1500, 0.02, "adam", verbose_each=0)
m_sh = tr.compute_metrics()["test"]

# 2-layer deep TGP: inner layer with the Salimbeni identity mean
deep = DeepTGPSpec(layers=(
    layer_spec(1, 1, 16, float(N), kernel),
    TGPSpec(Dy=1, Dx=1, M=16, N=float(N), kernel=kernel,
            likelihood=LikelihoodSpec("gaussian", 1)),
), S_train=1, S_test=50)
dp = init_deep_params(deep, X, X[::10][:16], variance_scale=1e-5)
tr2 = Trainer(deep, dp, loaders(), Y_std=np.ones(1), S_test=50, seed=1)
tr2.train(1500, 0.02, "adam", verbose_each=0)
m_dp = tr2.compute_metrics()["test"]

print(f"shallow SVGP : test logL {float(m_sh['logL'][0]):+.3f}  "
      f"rmse {float(m_sh['rmse'][0]):.4f}")
print(f"2-layer deep : test logL {float(m_dp['logL'][0]):+.3f}  "
      f"rmse {float(m_dp['rmse'][0]):.4f}")
print("(deep wins log-density by calibrating uncertainty at the step)")
