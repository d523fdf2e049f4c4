"""Heterogeneous per-output flow architectures (general 'single' connection)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list


def test_heterogeneous_flows_per_output():
    np.random.seed(0)
    N, Dx, Dy = 30, 3, 2
    X = np.random.randn(N, Dx)
    Y = np.random.randn(N, Dy)
    s0, i0 = spec_from_list(G.SAL(1))
    s1, i1 = spec_from_list(G.ArcSL(1))
    spec = M.TGPSpec(Dy=Dy, Dx=Dx, M=5, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", Dy, quad_points=32),
                     flow=s0, flow_per_output=(s0, s1))
    params = M.init_tgp_params(spec, X, X[:5], flow_inits=[i0, i1])
    e, ell, kld = M.elbo(spec, params, jnp.asarray(X), jnp.asarray(Y))
    assert np.isfinite(float(e))
    m1, m2, _, _ = M.predictive_distribution(spec, params, jnp.asarray(X))
    assert m1.shape == (Dy, N) and np.isfinite(np.asarray(m1)).all()
    # output 0 uses SAL identity-init -> m1 equals the latent mean there;
    # output 1 uses a random ArcSL -> must differ from the latent mean
    mu, var = M.marginal_qf(spec, params, jnp.asarray(X))
    np.testing.assert_allclose(np.asarray(m1[0]), np.asarray(mu[0]), atol=1e-6)
    assert np.abs(np.asarray(m1[1]) - np.asarray(mu[1])).max() > 1e-3
