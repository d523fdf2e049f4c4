"""Flow unit tests: identity-at-init, inverses, Jacobians, KLD, generators.

Mirrors the invariants the reference relies on implicitly (SURVEY.md §4):
SAL/BoxCox/Affine recover the identity at their canonical inits
(reference: code/dsp/models/flow.py:40), forward/inverse roundtrip, and the
Newton fallback matches analytic inverses.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.flows import (
    generators as G,
    spec_from_list,
    init_flow_params,
    flow_forward,
    flow_inverse,
    flow_kld,
    FlowCtx,
)
from tgp.pytorch_tpu.flows.core import newton_inverse, step_forward, FlowStep


F = jnp.linspace(-3.0, 3.0, 41)


def _build(gen_list):
    spec, inits = spec_from_list(gen_list)
    return spec, init_flow_params(spec, inits)


@pytest.mark.parametrize("gen", [
    lambda: G.SAL(1), lambda: G.SAL(3), lambda: G.Affine(2),
])
def test_identity_at_init(gen):
    spec, params = _build(gen())
    out = flow_forward(spec, params, F)
    np.testing.assert_allclose(np.asarray(out), np.asarray(F), atol=1e-10)


def test_boxcox_lam5_affine_not_identity_but_finite():
    # BoxCoxL at lam=5 is the reference's default init (flows.py:150); it is
    # not the identity but must be finite and monotone on (0, inf).
    spec, params = _build(G.BoxCoxL(1))
    x = jnp.linspace(0.1, 2.0, 50)
    out = np.asarray(flow_forward(spec, params, x))
    assert np.all(np.isfinite(out))
    assert np.all(np.diff(out) > 0)


def test_sal_inverse_roundtrip():
    np.random.seed(3)
    spec, params = _build(G.SAL(2, init_random=True))
    out = flow_forward(spec, params, F)
    back = flow_inverse(spec, params, out)
    np.testing.assert_allclose(np.asarray(back), np.asarray(F), atol=1e-8)


def test_newton_inverse_matches_analytic():
    step = FlowStep("arcsinh", set_restrictions=True)
    params = {"a": jnp.asarray(0.3), "b": jnp.asarray(0.5),
              "c": jnp.asarray(-0.2), "d": jnp.asarray(0.8)}
    y = step_forward(step, params, F)
    x_newton = newton_inverse(lambda x: step_forward(step, params, x), y, iters=200)
    np.testing.assert_allclose(np.asarray(x_newton), np.asarray(F), atol=1e-6)


def test_step_tanh_monotone_and_finite():
    np.random.seed(0)
    spec, params = _build(G.StepTanhL(2, 3, add_f0=True))
    x = jnp.linspace(-10, 10, 201)
    out = np.asarray(flow_forward(spec, params, x))
    assert np.all(np.isfinite(out))
    assert np.all(np.diff(out) > 0)  # strictly increasing (invertibility)


def test_step_sal_gates_initialised_to_inv_K():
    np.random.seed(0)
    spec, inits = spec_from_list(G.StepSAL(1, 4))
    params = init_flow_params(spec, inits)
    gates = params[0]["gates"]
    from tgp.pytorch_tpu.ops.transforms import softplus
    for g in gates:
        np.testing.assert_allclose(float(softplus(g["a"])), 1.0 / 4.0, rtol=1e-6)


def test_flow_kld_zero_for_point_estimate():
    spec, params = _build(G.SAL(2))
    assert float(flow_kld(spec, params)) == 0.0


def test_input_dependent_sal_forward_and_kld(rng):
    fl = G.SAL(1, input_dependent=True, input_dim=3, dropout=0.5,
               hidden_dim=8, num_hidden_layers=1, hidden_activation='relu',
               inference='MC_dropout')
    spec, inits = spec_from_list(fl)
    params = init_flow_params(spec, inits, key=rng)
    X = jax.random.normal(rng, (11, 3))
    f = jax.random.normal(rng, (5, 11))  # (S, MB) broadcasting over quad axis
    out = flow_forward(spec, params, f, X, FlowCtx(rng=rng, stochastic=True))
    assert out.shape == f.shape
    assert bool(jnp.isfinite(out).all())
    # deterministic path reproducible
    o1 = flow_forward(spec, params, f, X, FlowCtx(stochastic=False))
    o2 = flow_forward(spec, params, f, X, FlowCtx(stochastic=False))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert float(flow_kld(spec, params)) == 0.0  # MC dropout: no KL


def test_vi_hypernet_kld_positive(rng):
    fl = G.SAL(1, input_dependent=True, input_dim=3, hidden_dim=8,
               inference='mean_field_gaussian')
    spec, inits = spec_from_list(fl)
    params = init_flow_params(spec, inits, key=rng)
    kld = float(flow_kld(spec, params))
    assert kld > 0.0
    X = jax.random.normal(rng, (7, 3))
    f = jax.random.normal(rng, (4, 7))
    out = flow_forward(spec, params, f, X, FlowCtx(rng=rng, stochastic=True))
    assert bool(jnp.isfinite(out).all())


def test_tukey_and_exp_and_normalcdf_forward():
    for gen_list in ([("tukey_right", {"init_g": 0.1, "init_h": 0.1, "add_init_f0": False})],
                     [("exp", {})],
                     [("normalCDF", {"init_a": 0.0, "init_b": 1.0, "init_c": 0.0,
                                     "init_d": 1.0, "add_init_f0": True,
                                     "set_restrictions": False, "is_learnable": True})]):
        spec, inits = spec_from_list(gen_list)
        params = init_flow_params(spec, inits)
        out = flow_forward(spec, params, F)
        assert bool(jnp.isfinite(out).all())


def test_build_chain_combinations():
    for name in ("SAL_BCL", "SAL_InvBCL", "SAL_AL", "BCL_AL", "InvBCL_AL"):
        np.random.seed(0)
        spec, inits = spec_from_list(G.build_chain(name, 2))
        params = init_flow_params(spec, inits)
        out = flow_forward(spec, params, jnp.linspace(0.5, 2.0, 9))
        assert out.shape == (9,)


def test_vi_hypernet_one_layer_deeper_than_dropout():
    """Reference depth parity: BNN_VILR(H, num_H+1, ...) (flow.py:875-877,
    BNN_VILR.py:60-67) gives VI nets num_H+1 hidden layers where the
    MC-dropout MLPs get num_H (flow.py:665-689)."""
    from tgp.pytorch_tpu.flows.hypernet import HyperNetSpec
    mc = HyperNetSpec(in_dim=3, hidden_dim=8, num_hidden=1)
    vi = HyperNetSpec(in_dim=3, hidden_dim=8, num_hidden=1,
                      inference="mean_field_gaussian")
    assert len(mc.layer_dims()) == 2      # 1 hidden + linear output
    assert len(vi.layer_dims()) == 3      # 2 hidden + linear output
    assert vi.layer_dims()[:2] == ((3, 8), (8, 8))


def test_vi_prior_var_by_flow_family():
    """VI prior variance is flow-family dependent in the reference:
    0.5/1e-5 for the 4-param tanh flow (flow.py:697), 1.0 for the 2-param
    SAL flow (flow.py:874)."""
    idc = {"inference": "mean_field_gaussian"}
    sal, _ = spec_from_list([("sinh_arcsinh", {
        "input_dependent": True, "input_dim": 3,
        "input_dependent_config": idc})])
    tanh, _ = spec_from_list([("tanh", {
        "input_dependent": True, "input_dim": 3,
        "input_dependent_config": idc})])
    assert sal[0].hypernet.prior_var == 1.0
    assert tanh[0].hypernet.prior_var == 0.5 / 1e-5


def test_sibling_step_flow_hypernets_decorrelated():
    """init_flow_params must advance the key past a step_flow recursion:
    sibling step_flows (or a following top-level input-dependent step)
    otherwise initialize their hypernets bit-identically."""
    sub = [("sinh_arcsinh", {"input_dependent": True, "input_dim": 2,
                             "input_dependent_config": {}})]
    spec, inits = spec_from_list([("step_flow", {"flow_arr": sub}),
                                  ("step_flow", {"flow_arr": sub})])
    params = init_flow_params(spec, inits)
    W0 = np.asarray(params[0]["sub"][0]["net_a"]["layers"][0]["W"])
    W1 = np.asarray(params[1]["sub"][0]["net_a"]["layers"][0]["W"])
    assert not np.allclose(W0, W1)


def test_tukey_honors_add_init_f0():
    """tukey_left/right follow the generalized add_init_f0 contract
    (fk + f) like every other parametric kind."""
    f = jnp.linspace(-2.0, 2.0, 17)
    for kind in ("tukey_left", "tukey_right"):
        bare = FlowStep(kind)
        with_f0 = FlowStep(kind, add_init_f0=True)
        params = {"g": jnp.asarray(0.3), "h": jnp.asarray(0.2)}
        out_bare = step_forward(bare, params, f)
        out_f0 = step_forward(with_f0, params, f)
        np.testing.assert_allclose(np.asarray(out_f0),
                                   np.asarray(out_bare + f), rtol=1e-12)
