"""Classification batteries: the hold-kernel two-phase protocol
(reference bash_scripts/launch_test_uci_medium-small_classification.sh:9,
Hensman 2015b) composes from two train_multiseed calls — phase 1 freezes
kernel hyperparameters via the [0.0, name] group spec, phase 2 releases
them.  Verifies the grouped optimizer on stacked trees and the vmapped
classification metrics."""

from __future__ import annotations

import jax
import numpy as np

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as Mm
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.train import multiseed as ms


def _make_replica(r, N=60):
    rng = np.random.RandomState(300 + r)
    X = np.asarray(rng.randn(N, 2), np.float32)
    y = (X[:, 0] + 0.3 * X[:, 1] > 0).astype(np.int32)
    return X, y


def test_classification_battery_two_phase_hold_kernel():
    R, M = 2, 6
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(1))
    spec = Mm.TGPSpec(Dy=1, Dx=2, M=M, N=60.0,
                      kernel=K.from_name("scale_rbf"),
                      likelihood=LikelihoodSpec("bernoulli", 1,
                                                quad_points=10),
                      flow=fspec)
    Xs, Ys, ps = [], [], []
    for r in range(R):
        X, y = _make_replica(r)
        Xs.append(X)
        Ys.append(y)
        ps.append(Mm.init_tgp_params(
            spec, X, X[:M].copy(), variance_scale=1e-5,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
            noise_init=0.05, flow_inits=finits))
    stack0 = ms.stack_trees(ps)
    # host snapshots: the train scans donate the stacked buffers
    kern0 = jax.tree_util.tree_map(np.asarray, stack0["kernel"])
    q_mu0 = np.asarray(stack0["q_mu"])

    # phase 1: kernel held (lr=0 spec entry -> frozen group)
    stack1, curves1, state1 = ms.train_multiseed(
        spec, stack0, np.stack(Xs), np.stack(Ys), 30, 0.01,
        specs=[[0.0, "kernel"]], seed=9, return_state=True)
    for a, b in zip(jax.tree_util.tree_leaves(kern0),
                    jax.tree_util.tree_leaves(stack1["kernel"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # everything else trained
    assert not np.allclose(np.asarray(stack1["q_mu"]), q_mu0)
    # held leaves accumulated NO moments/steps in phase 1 (they were "not
    # in the optimizer"), trained leaves did — reference add_param_group
    from tgp.pytorch_tpu.train import group_adam as GA
    gstate = state1["opt_state"]
    assert isinstance(gstate, GA.GroupAdamState)
    assert int(jax.tree_util.tree_leaves(gstate.count)[0]) in (0, 30)
    kcounts = jax.tree_util.tree_leaves(gstate.count["kernel"])
    assert all(int(c) == 0 for c in kcounts)
    assert int(gstate.count["q_mu"]) == 30

    # phase 2: released — moments of pre-existing groups CARRY across the
    # boundary, the released kernel group starts fresh (torch semantics)
    stack2, curves2 = ms.train_multiseed(
        spec, stack1, np.stack(Xs), np.stack(Ys), 30, 0.01, carry=state1)
    assert not np.allclose(
        np.asarray(stack2["kernel"]["child"]["raw_lengthscale"]),
        np.asarray(kern0["child"]["raw_lengthscale"]))
    # the protocol helps: ELBO keeps improving across the boundary
    assert curves2["elbo"][-1].mean() > curves1["elbo"][0].mean()

    # vmapped classification metrics
    metrics = ms.eval_multiseed(spec, stack2, np.stack(Xs), np.stack(Ys),
                                np.ones((R, 1)), S_test=20)
    assert metrics["logL"].shape == (R,)
    assert metrics["acc"].shape == (R,)
    assert np.isfinite(metrics["logL"]).all()
    assert (metrics["acc"] > 0.5).all()      # linearly separable labels
