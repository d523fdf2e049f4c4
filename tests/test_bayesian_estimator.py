"""Golden test for the Bayesian double-LSE test-log-likelihood estimator.

reference: code/dsp/models/sparse_MF_SP.py:764-776 — the quad x MC double
logsumexp with sqrt(pi) constants is easy to get subtly wrong (SURVEY.md §7
hard parts).  With the hypernet weights zeroed, every MC-dropout draw
produces the same flow parameters, so the double-LSE estimator must reduce
EXACTLY to the point-estimate quadrature estimator for any S_MC:
    LSE_{s_mc}(c) - log S_MC = c.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list


def _zero_net(net):
    return jax.tree_util.tree_map(jnp.zeros_like, net)


def test_double_lse_reduces_to_pe_when_dropout_is_inert(rng):
    np.random.seed(0)
    N, Dx = 20, 3
    X = np.random.randn(N, Dx)
    Y = np.random.randn(N, 1)
    fl = G.SAL(1, input_dependent=True, input_dim=Dx, hidden_dim=8,
               dropout=0.5, inference="MC_dropout")
    fspec, finits = spec_from_list(fl)
    spec = M.TGPSpec(Dy=1, Dx=Dx, M=5, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1, quad_points=50),
                     flow=fspec)
    params = M.init_tgp_params(spec, X, X[:5], flow_inits=finits)

    # zero the hypernets: output = 0 regardless of dropout masks -> the SAL
    # step becomes fk = sinh(0*asinh(f) - 0) = 0... that collapses the warp;
    # instead zero only hidden layers and set the final bias to fixed values
    fp = params["flow"]
    sal = fp[0]
    for net_name, target in (("net_a", 0.3), ("net_b", 1.2)):
        net = jax.tree_util.tree_map(lambda x: x[0], sal[net_name])  # unstack Dy
        zeroed = _zero_net(net)
        zeroed["layers"][-1]["b"] = jnp.full_like(zeroed["layers"][-1]["b"], target)
        sal[net_name] = jax.tree_util.tree_map(lambda x: x[None], zeroed)

    Y_std = jnp.ones(1)
    Xd, Yd = jnp.asarray(X), jnp.asarray(Y)
    pe = M.test_log_likelihood(spec, params, Xd, Yd, Y_std, rng=rng)
    for S_MC in (1, 3, 7):
        ba = M.test_log_likelihood(spec, params, Xd, Yd, Y_std, S_MC=S_MC,
                                   fully_bayesian=True, rng=rng)
        np.testing.assert_allclose(np.asarray(ba), np.asarray(pe), rtol=1e-10)

    # moments must also agree between PE and the S_MC mixture
    m1_pe, m2_pe, _, _ = M.predictive_distribution(spec, params, Xd)
    m1_ba, m2_ba, _, _ = M.predictive_distribution(spec, params, Xd, S_MC=5,
                                                   fully_bayesian=True, rng=rng)
    np.testing.assert_allclose(np.asarray(m1_ba), np.asarray(m1_pe), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(m2_ba), np.asarray(m2_pe), rtol=1e-6)


def test_bayesian_estimator_with_real_dropout_is_finite_and_close(rng):
    np.random.seed(1)
    N, Dx = 15, 2
    X = np.random.randn(N, Dx)
    Y = np.random.randn(N, 1)
    fl = G.SAL(1, input_dependent=True, input_dim=Dx, hidden_dim=16,
               dropout=0.3, inference="MC_dropout")
    fspec, finits = spec_from_list(fl)
    spec = M.TGPSpec(Dy=1, Dx=Dx, M=5, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1, quad_points=50),
                     flow=fspec)
    params = M.init_tgp_params(spec, X, X[:5], flow_inits=finits)
    Y_std = jnp.ones(1)
    ba = M.test_log_likelihood(spec, params, jnp.asarray(X), jnp.asarray(Y),
                               Y_std, S_MC=64, fully_bayesian=True, rng=rng)
    pe = M.test_log_likelihood(spec, params, jnp.asarray(X), jnp.asarray(Y),
                               Y_std, rng=rng)
    assert np.isfinite(float(ba[0]))
    # randomly-initialised hypernets + dropout move the warp substantially;
    # just require the mixture estimator to stay in a sane range of the PE one
    assert abs(float(ba[0]) - float(pe[0])) < 2.0 * N
