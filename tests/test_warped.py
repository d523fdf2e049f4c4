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


def _log_exp_warp(Kt=3):
    """Snelson-shaped log_exp warp (linear term + sum-of-softplus):
    bijective on R with dT/dy >= 1, NO analytic inverse -> the predictive
    path must run newton_inverse (ref flow.py:111-133, 207-238)."""
    from tgp.pytorch_tpu.ops.transforms import inv_softplus
    return spec_from_list([("log_exp", {
        "add_init_f0": True,
        "init_a": [float(inv_softplus(1.0 / Kt))] * Kt,
        "init_b": [float(inv_softplus(1.0))] * Kt,
        "init_c": np.linspace(-1.0, 1.0, Kt).tolist()})])


def test_log_exp_warp_newton_inverse_roundtrip_after_training():
    """Train a WGP with the log_exp warp end-to-end, then assert the
    Newton-Raphson inverse round-trips the TRAINED warp to tolerance over
    the data range — the first in-anger exercise of the Newton fallback
    (round-4 verdict item; the SAL warp's inverse is analytic so it never
    hits newton_inverse)."""
    from tgp.pytorch_tpu.flows.core import (flow_forward, flow_inverse,
                                            _step_inverse_analytic)
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.train import Trainer

    wspec, winits = _log_exp_warp()
    # guard the premise: this spec has NO analytic inverse
    with pytest.raises(NotImplementedError):
        _step_inverse_analytic(wspec[0], None, jnp.zeros(()))

    np.random.seed(0)
    rs = np.random.RandomState(0)
    N, Dx = 80, 2
    X = rs.randn(N, Dx)
    Y = np.sinh(0.8 * rs.randn(N, 1))        # heavy-tailed target
    lik = LikelihoodSpec("warped", 1, quad_points=30, warp_flow=wspec)
    spec = M.TGPSpec(Dy=1, Dx=Dx, M=8, N=float(N),
                     kernel=K.from_name("scale_rbf"), likelihood=lik)
    params = M.init_tgp_params(spec, X, X[:8].copy(), variance_scale=1e-5,
                               noise_init=0.05, warp_inits=winits)
    a0 = np.asarray(params["likelihood"]["warp"][0]["a"]).copy()
    loaders = [DataLoader(ArrayDataset(X, Y), N, seed=0),
               DataLoader(ArrayDataset(X, Y), N, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=30)
    tr.train(300, 0.02, "adam", verbose_each=0)

    wp = tr.params["likelihood"]["warp"]
    # warp moved off its init (training actually exercised it)
    assert not np.allclose(np.asarray(wp[0]["a"]), a0)
    # Newton inverse round-trips the trained warp over the data range
    y = jnp.linspace(float(Y.min()) - 1.0, float(Y.max()) + 1.0, 512)
    f = flow_forward(wspec, wp, y)
    y_back = flow_inverse(wspec, wp, f, iters=100)
    np.testing.assert_allclose(np.asarray(y_back), np.asarray(y), atol=1e-6)

    # the full predictive path (quadrature of the Newton inverse) is finite
    # and sane: moments bounded by the y range under a trained model
    m = tr.compute_metrics()["test"]
    assert np.isfinite(m["logL"]).all() and np.isfinite(m["rmse"]).all()
    assert float(m["rmse"][0]) < 3.0 * float(np.std(Y))


def test_bare_log_exp_warp_is_refused_shape():
    """The bare (no linear term) log_exp maps R -> (0, inf); targets below
    inf T have no preimage and the clamped Newton walks away linearly.
    Pin the geometry fact that motivates add_init_f0 (PARITY WGP section)."""
    from tgp.pytorch_tpu.flows.core import flow_forward
    wspec, winits = spec_from_list([("log_exp", {
        "init_a": [0.0], "init_b": [0.0], "init_c": [0.0]})])
    wp = init_flow_params(wspec, winits)
    y = jnp.linspace(-30.0, 5.0, 64)
    f = flow_forward(wspec, wp, y)
    assert float(f.min()) > 0.0          # bounded below: not surjective
    wspec2, winits2 = _log_exp_warp()
    wp2 = init_flow_params(wspec2, winits2)
    f2 = flow_forward(wspec2, wp2, y)
    assert float(f2.min()) < -20.0       # linear term restores surjectivity


def test_warped_ell_multioutput_jacobian_not_overcounted():
    """Dy=2 warped ELL must equal the sum of the two per-output Dy=1 ELLs —
    a scalar log-Jacobian broadcast onto the (Dy,) base would count the
    Jacobian Dy times (round-5 review finding; latent at Dy=1)."""
    from tgp.pytorch_tpu.flows import generators as G
    np.random.seed(0)
    wspec, winits = spec_from_list(G.SAL(1))
    lik2 = LikelihoodSpec("warped", 2, quad_points=40, warp_flow=wspec)
    lik1 = LikelihoodSpec("warped", 1, quad_points=40, warp_flow=wspec)
    lp2 = init_likelihood_params(lik2, 0.1, warp_inits=winits)
    # a non-identity warp so the Jacobian term is nonzero
    lp2["warp"][0]["a"] = jnp.asarray(0.7, lp2["warp"][0]["a"].dtype)
    lp2["warp"][0]["b"] = jnp.asarray(0.4, lp2["warp"][0]["b"].dtype)
    rng = np.random.RandomState(1)
    Y = jnp.array(rng.randn(2, 7))
    mu = jnp.array(rng.randn(2, 7))
    var = jnp.array(rng.rand(2, 7) + 0.1)
    e2 = warped_ell(lik2, lp2, Y, mu, var, wspec, lp2["warp"])
    assert e2.shape == (2,)
    total = 0.0
    for d in range(2):
        lp1 = {"log_var_noise": lp2["log_var_noise"][d:d + 1],
               "warp": lp2["warp"]}
        e1 = warped_ell(lik1, lp1, Y[d:d + 1], mu[d:d + 1], var[d:d + 1],
                        wspec, lp2["warp"])
        total += float(e1.sum())
    np.testing.assert_allclose(float(e2.sum()), total, rtol=1e-9)
