"""Optimizer-path equivalence for the warped-GP likelihood.

The warped likelihood (N(T(y)|f,s2)|dT/dy|, reference:
code/dsp/likelihoods/WarpedGaussianLinearMean.py — implemented there but
never exercised by any reference entrypoint, and its log_marginal would
crash on the `sel.` typo at :166) previously had only analytic
cross-checks.  This runs N epochs of our Trainer against the eager-torch
replica (tools/torch_replica.py SparseTGP(obs_warp=...)) from identical
inits, fp64: the learnable SAL(1) observation warp, the closed-form
Gaussian ELL on T(y) plus the log-Jacobian, and the quadrature-of-inverse
predictive moments all agree or the final-ELBO comparison fails.
"""

import math
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
_PREV_TORCH_DTYPE = torch.get_default_dtype()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

EPOCHS = 40
N, DX, M_IND, QUAD = 160, 3, 8, 32


def _data():
    rng = np.random.RandomState(9)
    X = rng.randn(N, DX)
    # positively skewed targets: a warped GP's home turf
    y = np.exp(0.4 * np.sin(2 * X[:, 0]) + 0.3 * X[:, 1]
               + 0.15 * rng.randn(N)).reshape(-1, 1)
    y = (y - y.mean()) / y.std()
    return X, y


def _ours(X, y, Z0):
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    np.random.seed(0)
    wspec, _ = spec_from_list(G.SAL(1))
    lik = LikelihoodSpec("warped", 1, quad_points=QUAD, warp_flow=wspec)
    spec = M.TGPSpec(Dy=1, Dx=DX, M=M_IND, N=float(N),
                     kernel=K.from_name("scale_rbf"), likelihood=lik)
    params = M.init_tgp_params(
        spec, X, Z0, variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05)
    loaders = [DataLoader(ArrayDataset(X, y), 10000, seed=0)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=QUAD)
    tr.train(EPOCHS, 0.01, "adam", verbose_each=0, clip_norm=100.0)
    elbo, _, _ = M.elbo(spec, tr.params, jnp.asarray(X), jnp.asarray(y))
    # also exercise the quadrature-of-inverse predictive moments
    m1, m2, _, _ = M.predictive_distribution(spec, tr.params, jnp.asarray(X))
    assert np.isfinite(np.asarray(m1)).all() and (np.asarray(m2) > 0).all()
    return float(elbo)


def _replica(X, y, Z0):
    from torch_replica import SparseTGP, sal_flow

    torch.set_default_dtype(torch.float64)
    try:
        Xt = torch.tensor(X)
        yt = torch.tensor(y)
        model = SparseTGP(DX, M_IND, N, Z0, None, quad_points=QUAD,
                          obs_warp=sal_flow(1))
        opt = torch.optim.Adam(model.parameters(), lr=0.01)
        for _ in range(EPOCHS):
            elbo, _, _ = model.elbo(Xt, yt)
            model.zero_grad()
            (-elbo).backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 100.0)
            opt.step()
        final, _, _ = model.elbo(Xt, yt)
        return float(final.detach())
    finally:
        torch.set_default_dtype(_PREV_TORCH_DTYPE)


def test_warped_trajectory_matches_replica():
    X, y = _data()
    from tgp.pytorch_tpu.data import kmeans_centers

    Z0 = kmeans_centers(X, M_IND, n_init=10)
    ours = _ours(X, y, Z0)
    ref = _replica(X, y, Z0)
    assert math.isfinite(ours) and math.isfinite(ref)
    assert abs(ours - ref) / abs(ref) < 1e-5, (ours, ref)
