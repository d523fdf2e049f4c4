"""Spec serialization round-trips (JSON-able model descriptions)."""

import numpy as np
import jax.numpy as jnp

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.models.serialization import spec_to_json, spec_from_json
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list


def test_spec_json_roundtrip_simple():
    spec = M.svgp_spec(Dy=2, Dx=3, M=5, N=40.0, kernel=K.from_name("scale_rbf"),
                       likelihood=LikelihoodSpec("gaussian", 2))
    spec2 = spec_from_json(spec_to_json(spec))
    assert spec2 == spec


def test_spec_json_roundtrip_id_flow_and_warped():
    np.random.seed(0)
    fl = G.SAL(2, input_dependent=True, input_dim=3, hidden_dim=8,
               dropout=0.5, inference="MC_dropout")
    fspec, _ = spec_from_list(fl)
    wspec, _ = spec_from_list([("log", {})])
    spec = M.TGPSpec(Dy=1, Dx=3, M=5, N=40.0, kernel=K.from_name("scale_matern32"),
                     likelihood=LikelihoodSpec("warped", 1, quad_points=32,
                                               warp_flow=wspec),
                     flow=fspec, mean="identity", remat=True)
    spec2 = spec_from_json(spec_to_json(spec))
    assert spec2 == spec
    # spec2 is usable: build params and evaluate
    X = np.random.randn(20, 3)
    params = M.init_tgp_params(spec2, X, X[:5])
    Y = np.exp(np.random.randn(20, 1) * 0.3)
    e, _, _ = M.elbo(spec2, params, jnp.asarray(X), jnp.asarray(Y))
    assert np.isfinite(float(e))


def test_spec_json_roundtrip_step_flow_and_spectral_kernel():
    np.random.seed(0)
    fspec, _ = spec_from_list(G.StepTanhL(2, 3, add_f0=True))
    kspec = K.spectral_mixture(2)
    spec = M.TGPSpec(Dy=1, Dx=1, M=4, N=10.0, kernel=kspec,
                     likelihood=LikelihoodSpec("gaussian_flow", 1, quad_points=16),
                     flow=fspec)
    assert spec_from_json(spec_to_json(spec)) == spec


def test_spec_json_roundtrip_solve_levers():
    """fast_solves/solve_precision are part of the compiled program's
    identity — dropping them on reload silently redeploys under different
    numerics (round-5 review finding)."""
    spec = M.svgp_spec(Dy=1, Dx=2, M=4, N=10.0,
                       kernel=K.from_name("scale_rbf"),
                       likelihood=LikelihoodSpec("gaussian", 1),
                       fast_solves=True, solve_precision="high")
    spec2 = spec_from_json(spec_to_json(spec))
    assert spec2 == spec
    assert spec2.fast_solves and spec2.solve_precision == "high"


def test_spec_json_roundtrip_deep():
    from tgp.pytorch_tpu.models.deep import DeepTGPSpec, layer_spec
    np.random.seed(0)
    fspec, _ = spec_from_list(G.SAL(1))
    inner = layer_spec(3, 2, 4, 20.0, K.from_name("scale_rbf"))
    outer = M.TGPSpec(Dy=1, Dx=2, M=4, N=20.0,
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("gaussian_flow", 1,
                                                quad_points=16),
                      flow=fspec)
    spec = DeepTGPSpec(layers=(inner, outer), S_train=2, S_test=7)
    spec2 = spec_from_json(spec_to_json(spec))
    assert spec2 == spec and spec2.S_test == 7
