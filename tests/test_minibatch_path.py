"""Device-resident minibatch scan path must match the host batch loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.train import Trainer


def _setup():
    rng = np.random.RandomState(0)
    X = rng.randn(70, 3)           # 70 rows, batch 32 -> 2 full + tail of 6
    Y = rng.randn(70, 1)
    spec = M.TGPSpec(Dy=1, Dx=3, M=5, N=70.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian", 1))
    params = M.init_tgp_params(spec, X, X[:5])
    return spec, params, X, Y


def _train(device_resident: bool, epochs=5):
    spec, params, X, Y = _setup()
    loaders = [DataLoader(ArrayDataset(X, Y), 32, seed=3),
               DataLoader(ArrayDataset(X, Y), 32, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=10, seed=1)
    if not device_resident:
        tr.DEVICE_RESIDENT_BYTES = 0  # force the host loop
    tr.train(epochs, 0.05, "adam", verbose_each=0)
    return tr.params


def test_device_path_matches_host_loop():
    p_dev = _train(True)
    p_host = _train(False)
    for a, b in zip(jax.tree_util.tree_leaves(p_dev),
                    jax.tree_util.tree_leaves(p_host)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=1e-6)
