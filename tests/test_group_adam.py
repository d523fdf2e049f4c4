"""Grouped Adam with cross-phase state carry vs torch semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.train import group_adam as GA


def test_matches_torch_adam_single_group():
    torch = pytest.importorskip("torch")
    torch.set_default_dtype(torch.float64)
    rng = np.random.RandomState(0)
    w0 = rng.randn(4)
    grads = [rng.randn(4) for _ in range(12)]

    # torch
    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.Adam([wt], lr=0.05, weight_decay=0.1)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()

    # ours
    params = {"w": jnp.asarray(w0)}
    state = GA.init_state(params)
    lr_t = {"w": 0.05}
    wd_t = {"w": 0.1}
    act_t = {"w": True}
    p = params
    for g in grads:
        upd, state = GA.update({"w": jnp.asarray(g)}, state, p, lr_t, wd_t, act_t)
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
    np.testing.assert_allclose(np.asarray(p["w"]), wt.detach().numpy(), rtol=1e-10)


def test_phase_carry_matches_torch_add_param_group():
    torch = pytest.importorskip("torch")
    torch.set_default_dtype(torch.float64)
    rng = np.random.RandomState(1)
    a0, b0 = rng.randn(3), rng.randn(3)
    gs = [(rng.randn(3), rng.randn(3)) for _ in range(10)]

    # torch: train a for 5 steps, then add b as a new group
    at = torch.tensor(a0, requires_grad=True)
    bt = torch.tensor(b0, requires_grad=True)
    opt = torch.optim.Adam([at], lr=0.05)
    for ga, gb in gs[:5]:
        opt.zero_grad()
        at.grad = torch.tensor(ga)
        opt.step()
    opt.add_param_group({"params": [bt], "lr": 0.02})
    for ga, gb in gs[5:]:
        opt.zero_grad()
        at.grad = torch.tensor(ga)
        bt.grad = torch.tensor(gb)
        opt.step()

    # ours: same via annotation swap, ONE persistent state
    params = {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
    state = GA.init_state(params)
    lr1, wd1, act1 = {"a": 0.05, "b": 0.0}, {"a": 0.0, "b": 0.0}, {"a": True, "b": False}
    lr2, wd2, act2 = {"a": 0.05, "b": 0.02}, {"a": 0.0, "b": 0.0}, {"a": True, "b": True}
    p = params
    for i, (ga, gb) in enumerate(gs):
        lr, wd, act = (lr1, wd1, act1) if i < 5 else (lr2, wd2, act2)
        upd, state = GA.update({"a": jnp.asarray(ga), "b": jnp.asarray(gb)},
                               state, p, lr, wd, act)
        p = jax.tree_util.tree_map(lambda x, u: x + u, p, upd)
    np.testing.assert_allclose(np.asarray(p["a"]), at.detach().numpy(), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p["b"]), bt.detach().numpy(), rtol=1e-10)


def test_annotations_from_specs():
    params = {"kernel": {"ls": jnp.zeros(2)}, "q_mu": jnp.zeros(3),
              "flow": [{"a": jnp.zeros(())}]}
    lr, wd, act = GA.annotations_from_specs(
        params, [[0.0, "kernel"], [0.05, 1e-4, "flow"]], 0.01)
    assert act["kernel"]["ls"] is False
    assert lr["flow"][0]["a"] == 0.05 and wd["flow"][0]["a"] == 1e-4
    assert lr["q_mu"] == 0.01 and act["q_mu"] is True


def _torch_adamw_steps(w0, grads, lr, wd):
    """Oracle: torch.optim.AdamW — what the reference factory actually
    instantiates for 'adam_W' (reference optimizers.py:13-14)."""
    import torch
    wt = torch.tensor(w0, requires_grad=True)
    opt = torch.optim.AdamW([wt], lr=lr, weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.tensor(g)
        opt.step()
    return wt.detach().numpy()


def _reference_radam_steps(w0, grads, lr, wd, b1=0.9, b2=0.999, eps=1e-8):
    """The reference's RAdam as constructed: degenerated_to_sgd=False
    (optimizers.py:16,26-115) — NO update while rho_t < 5, re-derived in
    numpy."""
    p = w0.copy()
    mu = np.zeros_like(p)
    nu = np.zeros_like(p)
    rho_inf = 2 / (1 - b2) - 1
    for t, g in enumerate(grads, start=1):
        nu = b2 * nu + (1 - b2) * g * g
        mu = b1 * mu + (1 - b1) * g
        b2t = b2 ** t
        rho_t = rho_inf - 2 * t * b2t / (1 - b2t)
        if rho_t >= 5:
            if wd:
                p = p - wd * lr * p
            r = np.sqrt((1 - b2t) * (rho_t - 4) / (rho_inf - 4)
                        * (rho_t - 2) / rho_t * rho_inf / (rho_inf - 2))
            p = p - lr * (r / (1 - b1 ** t)) * mu / (np.sqrt(nu) + eps)
        # else: step_size = -1 -> no update, no weight decay
    return p


@pytest.mark.parametrize("wd", [0.0, 0.01, 0.1])
def test_matches_torch_adamw(wd):
    torch = pytest.importorskip("torch")
    torch.set_default_dtype(torch.float64)
    rng = np.random.RandomState(2)
    w0 = rng.randn(5)
    grads = [rng.randn(5) for _ in range(15)]
    ref = _torch_adamw_steps(w0, grads, lr=0.05, wd=wd)

    p = {"w": jnp.asarray(w0)}
    state = GA.init_state(p)
    for g in grads:
        upd, state = GA.update({"w": jnp.asarray(g)}, state, p,
                               {"w": 0.05}, {"w": wd}, {"w": True},
                               kind="adam_W")
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
    np.testing.assert_allclose(np.asarray(p["w"]), ref, rtol=1e-10)


@pytest.mark.parametrize("wd", [0.0, 0.1])
def test_matches_reference_radam(wd):
    # 15 steps cross the rho_t >= 5 activation boundary (no-step warm-up
    # region first: degenerated_to_sgd=False takes NO step there)
    rng = np.random.RandomState(3)
    w0 = rng.randn(5)
    grads = [rng.randn(5) for _ in range(15)]
    ref = _reference_radam_steps(w0, grads, lr=0.05, wd=wd)

    p = {"w": jnp.asarray(w0)}
    state = GA.init_state(p)
    for i, g in enumerate(grads):
        upd, state = GA.update({"w": jnp.asarray(g)}, state, p,
                               {"w": 0.05}, {"w": wd}, {"w": True},
                               kind="adam_R")
        p = jax.tree_util.tree_map(lambda a, u: a + u, p, upd)
        if i < 3:
            # warm-up region: parameters untouched
            np.testing.assert_array_equal(np.asarray(p["w"]), w0)
    np.testing.assert_allclose(np.asarray(p["w"]), ref, rtol=1e-10)


def test_radam_phase_carry():
    """Moments/counts carry across an annotation swap for adam_R too."""
    rng = np.random.RandomState(4)
    a0, b0 = rng.randn(3), rng.randn(3)
    gs = [(rng.randn(3), rng.randn(3)) for _ in range(12)]

    # oracle: 'a' steps 12 times, 'b' steps only the last 6 (fresh counts)
    ref_a = _reference_radam_steps(a0, [g[0] for g in gs], lr=0.05, wd=0.0)
    ref_b = _reference_radam_steps(b0, [g[1] for g in gs[6:]], lr=0.02,
                                   wd=0.0)

    p = {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
    state = GA.init_state(p)
    for i, (ga, gb) in enumerate(gs):
        act = {"a": True, "b": i >= 6}
        lr = {"a": 0.05, "b": 0.02}
        upd, state = GA.update({"a": jnp.asarray(ga), "b": jnp.asarray(gb)},
                               state, p, lr, {"a": 0.0, "b": 0.0}, act,
                               kind="adam_R")
        p = jax.tree_util.tree_map(lambda x, u: x + u, p, upd)
    np.testing.assert_allclose(np.asarray(p["a"]), ref_a, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(p["b"]), ref_b, rtol=1e-10)


def test_default_wd_for_unmatched_and_two_entry_specs():
    params = {"net_w": jnp.zeros(2), "q_mu": jnp.zeros(3)}
    lr, wd, act = GA.annotations_from_specs(
        params, [[0.05, "net_"]], 0.01, default_wd=0.01)
    assert wd["net_w"] == 0.01 and wd["q_mu"] == 0.01
    lr2, wd2, _ = GA.annotations_from_specs(
        params, [[0.05, 0.0, "net_"]], 0.01, default_wd=0.01)
    assert wd2["net_w"] == 0.0 and wd2["q_mu"] == 0.01
