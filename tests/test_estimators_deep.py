"""Deeper estimator checks: Bernoulli eq-3.77 vs quadrature, Newton inverse
on non-analytic flows, classification two-phase schedule."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.likelihoods.classification import bernoulli_moments
from tgp.pytorch_tpu.likelihoods.gaussian import init_likelihood_params
from tgp.pytorch_tpu.flows import generators as G, spec_from_list, init_flow_params
from tgp.pytorch_tpu.flows.core import flow_forward, flow_inverse, newton_inverse, step_forward
from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.train import Trainer


def test_bernoulli_eq377_matches_quadrature_for_identity_flow():
    """The exact GP-book eq. 3.77 path and the generic quadrature path must
    agree when the flow is the identity (reference switches between them,
    Bernoulli.py:128-155)."""
    lik = LikelihoodSpec("bernoulli", 1, quad_points=100)
    lp = init_likelihood_params(lik)
    rng = np.random.RandomState(0)
    mu = jnp.array(rng.randn(1, 13))
    var = jnp.array(rng.rand(1, 13) + 0.05)
    p_exact = bernoulli_moments(lik, lp, mu, var, warp=lambda f: f,
                                identity_flow=True)
    p_quad = bernoulli_moments(lik, lp, mu, var, warp=lambda f: f,
                               identity_flow=False)
    np.testing.assert_allclose(np.asarray(p_exact), np.asarray(p_quad),
                               atol=2e-4)


def test_newton_inverse_on_step_tanh_flow():
    """StepTanh flows have no analytic inverse (reference falls back to
    Newton-Raphson, flow.py:97-133); the lax.fori_loop version must
    roundtrip within tolerance on the monotone range."""
    np.random.seed(0)
    spec, inits = spec_from_list(G.StepTanhL(1, 2, add_f0=True))
    params = init_flow_params(spec, inits)
    x = jnp.linspace(-2.0, 2.0, 31)
    y = flow_forward(spec, params, x)
    x_rec = flow_inverse(spec, params, y, iters=300)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)


def test_two_phase_schedule_holds_kernel_params():
    """Classification protocol: kernel params frozen for phase 1
    (Hensman 2015b; reference launcher hold_K_params=2000)."""
    rng = np.random.RandomState(0)
    X = rng.randn(40, 2)
    Y = (X[:, :1] > 0).astype(np.float64)
    spec = M.TGPSpec(Dy=1, Dx=2, M=5, N=40.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("bernoulli", 1, quad_points=8))
    params = M.init_tgp_params(spec, X, X[:5])
    loaders = [DataLoader(ArrayDataset(X, Y), 40, seed=0)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=5, seed=0)
    k0 = np.asarray(params["kernel"]["child"]["raw_lengthscale"]).copy()

    captured = {}
    orig_train = None

    # phase 1 only: kernel must not move
    tr.train(10, 0.05, "adam",
             optimisation_schedule=([1.0], [[[0.0, "kernel"]]]),
             verbose_each=0)
    np.testing.assert_array_equal(
        np.asarray(tr.params["kernel"]["child"]["raw_lengthscale"]), k0)
    # two-phase: kernel moves in phase 2
    tr.train(10, 0.05, "adam",
             optimisation_schedule=([0.5, 0.5], [[[0.0, "kernel"]], None]),
             verbose_each=0)
    assert not np.array_equal(
        np.asarray(tr.params["kernel"]["child"]["raw_lengthscale"]), k0)


def test_boxcox_forward_monotone_and_inverse_via_newton():
    spec, inits = spec_from_list([("boxcox", {"init_lam": 1.7, "add_init_f0": False,
                                              "constraint": None})])
    params = init_flow_params(spec, inits)
    x = jnp.linspace(0.1, 3.0, 21)
    y = flow_forward(spec, params, x)
    assert np.all(np.diff(np.asarray(y)) > 0)
    x_rec = newton_inverse(lambda t: flow_forward(spec, params, t), y,
                           init=jnp.ones_like(y), iters=200)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-5)
