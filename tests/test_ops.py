"""Numerics-core tests: quadrature, linalg, kernels, transforms."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import norm

from tgp.pytorch_tpu.ops import (
    GaussHermite, safe_cholesky, tril_solve, cholesky_solve,
    batched_log_gaussian, kl_whitened, kl_gaussian,
    softplus, inv_softplus,
)
from tgp.pytorch_tpu.ops import kernels as K


# ---------------------------------------------------------------- quadrature

def test_gh_polynomial_moments():
    gh = GaussHermite(20)
    mu, var = jnp.array([0.7]), jnp.array([2.3])
    # E[f] = mu, E[f^2] = var + mu^2, E[f^3] = mu^3 + 3 mu var
    np.testing.assert_allclose(float(gh.integrate(lambda f: f, mu, var)[0]), 0.7, rtol=1e-10)
    np.testing.assert_allclose(float(gh.integrate(lambda f: f**2, mu, var)[0]),
                               2.3 + 0.49, rtol=1e-10)
    np.testing.assert_allclose(float(gh.integrate(lambda f: f**3, mu, var)[0]),
                               0.7**3 + 3 * 0.7 * 2.3, rtol=1e-9)


def test_gh_expected_log_gaussian_closed_form():
    # E_{N(m,s2)}[log N(y|f, c2)] = log N(y|m, c2) - s2/(2 c2)
    gh = GaussHermite(60)
    m, s2, c2, y = 0.3, 0.8, 0.25, -0.4
    val = float(gh.integrate(
        lambda f: -0.5 * (np.log(2 * np.pi * c2) + (y - f) ** 2 / c2),
        jnp.array([m]), jnp.array([s2]))[0])
    expected = norm.logpdf(y, m, np.sqrt(c2)) - s2 / (2 * c2)
    np.testing.assert_allclose(val, expected, rtol=1e-9)


# ------------------------------------------------------------------- linalg

def test_batched_log_gaussian_vs_scipy():
    rng = np.random.RandomState(0)
    obs, mean = rng.randn(3, 5), rng.randn(3, 5)
    cov = rng.rand(3, 5) + 0.1
    ours = np.asarray(batched_log_gaussian(jnp.array(obs), jnp.array(mean), jnp.array(cov)))
    ref = norm.logpdf(obs, mean, np.sqrt(cov)).sum(-1)
    np.testing.assert_allclose(ours, ref, rtol=1e-10)
    # precision form
    ours_inv = np.asarray(batched_log_gaussian(
        jnp.array(obs), jnp.array(mean), jnp.array(1.0 / cov), cov_is_inverse=True))
    np.testing.assert_allclose(ours_inv, ref, rtol=1e-10)


def test_safe_cholesky_jitter_and_solves():
    rng = np.random.RandomState(1)
    A = rng.randn(4, 6, 6)
    A = A @ np.swapaxes(A, -1, -2)  # PSD
    L, Aj = safe_cholesky(jnp.array(A), jitter=1e-10)
    np.testing.assert_allclose(np.asarray(L @ jnp.swapaxes(L, -1, -2)),
                               np.asarray(Aj), rtol=1e-8)
    b = rng.randn(4, 6, 2)
    x = cholesky_solve(L, jnp.array(b))
    np.testing.assert_allclose(np.asarray(jnp.einsum("bij,bjk->bik", Aj, x)),
                               b, rtol=1e-6)


def test_cholesky_ladder_rescues_indefinite_fp32_gram():
    # a smooth-kernel Gram that is indefinite at fp32 rounding (the failure
    # mode that NaN'd power M=100 runs before the ladder existed)
    rng = np.random.RandomState(0)
    X = rng.randn(100, 4) * 0.05          # tightly clustered -> near-rank-1
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    A32 = jnp.asarray(2.0 * np.exp(-0.5 * d2), jnp.float32)[None]
    w = np.linalg.eigvalsh(np.asarray(A32[0], np.float64))
    assert w.min() < 1e-5  # genuinely near-singular
    L, Aj = safe_cholesky(A32)
    assert bool(jnp.isfinite(L).all())

    # gradient through the ladder stays finite (stop-gradient probes keep
    # failing factorizations out of the autodiff graph)
    def f(a):
        L, _ = safe_cholesky(a)
        return jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1) ** 2 + 1e-12))

    g = jax.grad(f)(A32)
    assert bool(jnp.isfinite(g).all())


def test_cholesky_explicit_jitter_passthrough():
    A = jnp.eye(4)[None] * 2.0
    L, Aj = safe_cholesky(A, jitter=0.5)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(Aj, axis1=-2, axis2=-1)),
                               2.5)


def test_kl_whitened_equals_full_gaussian_vs_standard_normal():
    rng = np.random.RandomState(2)
    m = jnp.array(rng.randn(3, 5))
    Lr = jnp.array(rng.randn(3, 5, 5) * 0.1 + np.eye(5))
    kw = kl_whitened(m, Lr)
    kg = kl_gaussian(m, Lr, jnp.zeros((3, 5)), jnp.broadcast_to(jnp.eye(5), (3, 5, 5)),
                     jitter=0.0)
    np.testing.assert_allclose(np.asarray(kw), np.asarray(kg), rtol=1e-9)


def test_kl_gaussian_zero_when_equal():
    rng = np.random.RandomState(3)
    A = rng.randn(5, 5) * 0.3
    K_p = A @ A.T + np.eye(5)
    L_p = np.linalg.cholesky(K_p)
    m = rng.randn(5)
    kl = kl_gaussian(jnp.array(m), jnp.array(L_p), jnp.array(m), jnp.array(K_p), jitter=0.0)
    assert abs(float(kl)) < 1e-9


# ------------------------------------------------------------------ kernels

def _naive_rbf(X, Z, ls, ks):
    out = np.zeros((X.shape[0], Z.shape[0]))
    for i in range(X.shape[0]):
        for j in range(Z.shape[0]):
            d2 = np.sum(((X[i] - Z[j]) / ls) ** 2)
            out[i, j] = ks * np.exp(-0.5 * d2)
    return out


def test_rbf_gram_vs_naive_loop():
    rng = np.random.RandomState(4)
    Dy, N, M, Dx = 2, 7, 5, 3
    X = rng.randn(Dy, N, Dx)
    Z = rng.randn(Dy, M, Dx)
    spec = K.from_name("scale_rbf")
    params = K.init_params(spec, Dy, Dx, {"length_scale": 1.7, "kernel_scale": 0.9})
    G = np.asarray(K.gram(spec, params, jnp.array(X), jnp.array(Z)))
    for d in range(Dy):
        np.testing.assert_allclose(G[d], _naive_rbf(X[d], Z[d], 1.7, 0.9), rtol=1e-8)


@pytest.mark.parametrize("name", ["rbf", "matern32", "scale_matern32", "matern52", "periodic"])
def test_kernel_psd_and_diag(name):
    rng = np.random.RandomState(5)
    X = jnp.array(rng.randn(2, 10, 3))
    spec = K.from_name(name)
    params = K.init_params(spec, 2, 3, {"length_scale": 1.0, "kernel_scale": 1.0})
    G = np.asarray(K.gram(spec, params, X, X, same=True))
    for d in range(2):
        w = np.linalg.eigvalsh(G[d])
        assert w.min() > -1e-8
    diag = np.asarray(K.gram_diag(spec, params, X))
    np.testing.assert_allclose(np.stack([np.diag(G[d]) for d in range(2)]), diag, rtol=1e-8)


def test_white_noise_gating():
    # noise only on K(X,X) with same=True; zero cross-covariance
    # (reference: code/dsp/models/kernels.py:42-55)
    rng = np.random.RandomState(6)
    X = jnp.array(rng.randn(1, 4, 2))
    Z = jnp.array(rng.randn(1, 3, 2))
    spec = K.from_name("whitenoise")
    params = K.init_params(spec, 1, 2, {"noisy_variance": 0.5})
    same = np.asarray(K.gram(spec, params, X, X, same=True))
    np.testing.assert_allclose(same[0], 0.5 * np.eye(4), rtol=1e-6)
    assert np.all(np.asarray(K.gram(spec, params, X, Z)) == 0)
    assert np.all(np.asarray(K.gram(spec, params, X, X, same=False)) == 0)


def test_additive_product_combinators():
    rng = np.random.RandomState(7)
    X = jnp.array(rng.randn(1, 6, 2))
    s1, s2 = K.from_name("rbf"), K.from_name("matern32")
    add = K.additive(s1, s2)
    prod = K.product(s1, s2)
    pa = K.init_params(add, 1, 2)
    pp = K.init_params(prod, 1, 2)
    g1 = np.asarray(K.gram(s1, pa["children"][0], X, X))
    g2 = np.asarray(K.gram(s2, pa["children"][1], X, X))
    np.testing.assert_allclose(np.asarray(K.gram(add, pa, X, X)), g1 + g2, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(K.gram(prod, pp, X, X)), g1 * g2, rtol=1e-8)


# --------------------------------------------------------------- transforms

def test_softplus_roundtrip():
    x = jnp.linspace(-5, 5, 11)
    np.testing.assert_allclose(np.asarray(inv_softplus(softplus(x))), np.asarray(x),
                               atol=1e-9)
