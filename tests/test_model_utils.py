"""Tests: confidence intervals, prior sampling, inducing propagation,
spectral mixture kernels, spectral density estimation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.ops.spectral import estimate_spectral_density
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.models.utils import (
    confidence_intervals, compute_95_and_median_confidence_intervals,
    sample_prior, propagate_inducing)
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import spec_from_list


def _model(lik="gaussian", warp=None, Dy=1):
    rng = np.random.RandomState(0)
    X = rng.randn(25, 3)
    wspec = ()
    if warp is not None:
        wspec, _ = spec_from_list(warp)
    spec = M.TGPSpec(Dy=Dy, Dx=3, M=6, N=25.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec(lik, Dy, quad_points=24,
                                               warp_flow=wspec))
    params = M.init_tgp_params(spec, X, X[:6])
    return spec, params, jnp.array(X)


def test_confidence_intervals_sampling(rng):
    spec, params, X = _model()
    ci = compute_95_and_median_confidence_intervals(spec, params, X, 400, rng)
    lo, med, hi = ci[0]
    assert np.all(lo <= med + 1e-6) and np.all(med <= hi + 1e-6)
    # ~95% of fresh predictive samples inside the band
    y, _, _ = M.sample_predictive(spec, params, X, 400, jax.random.PRNGKey(7))
    inside = ((np.asarray(y[0]) >= lo) & (np.asarray(y[0]) <= hi)).mean()
    assert inside > 0.9


def test_confidence_intervals_warped_closed_path(rng):
    spec, params, X = _model(lik="warped", warp=[("log", {})])
    ci = confidence_intervals(spec, params, X, [0.025, 0.5, 0.975], 100, rng)
    lo, med, hi = ci[0]
    assert np.all(lo > 0) and np.all(lo <= med) and np.all(med <= hi)


def test_sample_prior_moments(rng):
    spec, params, X = _model()
    f = sample_prior(spec, params, X, 3000, rng)
    m = np.asarray(f.mean(axis=0))[0]
    v = np.asarray(f.var(axis=0))[0]
    assert np.all(np.abs(m) < 0.15)           # zero mean function
    # marginal prior variance = kernel_scale (default 1.0)
    assert np.all(np.abs(v - 1.0) < 0.25)


def test_propagate_inducing_modes(rng):
    spec, params, X = _model(Dy=2)
    Z = np.random.RandomState(1).randn(6, 3)
    out = propagate_inducing(spec, params, Z, 2)
    assert out.shape == (6, 2)
    out2 = propagate_inducing(spec, params, Z, 3)   # identity (3==3)
    np.testing.assert_allclose(out2, Z)
    out3 = propagate_inducing(spec, params, Z, 2, rng=rng, how="sampling")
    assert out3.shape == (6, 2)
    # fill path needs a model with Dy >= out_dim (the reference indexes the
    # previous layer's Dy prior draws by output column, utils_models.py:350)
    spec5, params5, _ = _model(Dy=5)
    out4 = propagate_inducing(spec5, params5, Z, 5, rng=rng,
                              how="salimbeni+sampling")
    assert out4.shape == (6, 5)
    # first 3 dims are the projection, the rest are function draws (nonzero)
    assert np.abs(out4[:, 3:]).sum() > 0


def test_spectral_mixture_kernel_psd():
    spec = K.spectral_mixture(2, base="periodic")
    params = K.init_spectral_mixture_params(
        spec, 1, 1, periods=[1.0, 0.5], lengthscales=[1.0, 2.0],
        magnitudes=[1.0, 0.3])
    X = jnp.linspace(0, 3, 20).reshape(1, 20, 1)
    G = np.asarray(K.gram(spec, params, X, X, same=True))[0]
    w = np.linalg.eigvalsh(G)
    assert w.min() > -1e-7
    np.testing.assert_allclose(G, G.T, atol=1e-10)


def test_estimate_spectral_density_finds_tone():
    x = np.linspace(0, 10, 1000)
    y = np.sin(2 * np.pi * 3.0 * x)          # 3 Hz tone
    freqs, periods = estimate_spectral_density(x, y, prominence=10)
    assert any(abs(f - 3.0) < 0.2 for f in freqs)
