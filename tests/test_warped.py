"""Warped-GP likelihood tests (reference: WarpedGaussianLinearMean.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.likelihoods.warped import warped_ell, warped_moments
from tgp.pytorch_tpu.likelihoods.gaussian import (
    gaussian_ell, gaussian_moments, init_likelihood_params)
from tgp.pytorch_tpu.flows import spec_from_list, init_flow_params


def _identity_warp():
    return spec_from_list([("affine", {"init_a": 1.0, "init_b": 0.0,
                                       "set_restrictions": False})])


def test_warped_ell_reduces_to_gaussian_for_identity_warp():
    wspec, winits = _identity_warp()
    lik_w = LikelihoodSpec("warped", 1, quad_points=60, warp_flow=wspec)
    lik_g = LikelihoodSpec("gaussian", 1)
    lp = init_likelihood_params(lik_w, 0.1)
    rng = np.random.RandomState(0)
    Y = jnp.array(rng.randn(1, 9))
    mu = jnp.array(rng.randn(1, 9))
    var = jnp.array(rng.rand(1, 9) + 0.1)
    e_w = warped_ell(lik_w, lp, Y, mu, var, wspec, lp["warp"])
    e_g = gaussian_ell(lik_g, {"log_var_noise": lp["log_var_noise"]}, Y, mu, var)
    np.testing.assert_allclose(float(e_w.sum()), float(e_g.sum()), rtol=1e-9)


def test_warped_moments_identity_match_gaussian():
    wspec, _ = _identity_warp()
    lik_w = LikelihoodSpec("warped", 1, quad_points=80, warp_flow=wspec)
    lp = init_likelihood_params(lik_w, 0.1)
    mu = jnp.array([[0.3, -0.5]])
    var = jnp.array([[0.2, 0.4]])
    m1, m2 = warped_moments(lik_w, lp, mu, var, wspec, lp["warp"])
    g1, g2 = gaussian_moments(lik_w, lp, mu, var)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(g1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(g2), rtol=1e-4)


def test_warped_model_elbo_and_sampling(rng):
    np.random.seed(0)
    N, Dx = 40, 2
    X = np.random.randn(N, Dx)
    Ypos = np.exp(0.5 * np.random.randn(N, 1))   # positive targets
    # warp T = log: N(log y | f, s2), classic warped-GP for positive data
    wspec, winits = spec_from_list([("log", {})])
    lik = LikelihoodSpec("warped", 1, quad_points=40, warp_flow=wspec)
    spec = M.TGPSpec(Dy=1, Dx=Dx, M=6, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=lik)
    params = M.init_tgp_params(spec, X, X[:6])
    e, ell, kld = M.elbo(spec, params, jnp.array(X), jnp.array(Ypos))
    assert np.isfinite(float(e))
    g = jax.grad(lambda p: -M.elbo(spec, p, jnp.array(X), jnp.array(Ypos))[0])(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))
    # predictive sampling inverts the warp: samples must be positive
    y, fk, f0 = M.sample_predictive(spec, params, jnp.array(X), 9, rng)
    assert bool((y > 0).all())
    # moment-matched test log-likelihood finite
    ll = M.test_log_likelihood(spec, params, jnp.array(X), jnp.array(Ypos),
                               jnp.ones(1))
    assert np.isfinite(np.asarray(ll)).all()
