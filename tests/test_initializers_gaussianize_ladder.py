"""Ladder step-flow init + gaussianization initializer.

Independent-recompute coverage for the two initializer-family members that
previously had none:
  * `step_flow_ladder`  <- reference `initalize_step_flow_as_ladder`
    (code/dsp/initializers/initializers.py:425-475),
  * `gaussianize`       <- `find_flow_params_that_makes_marginals_standard_
    normal` (initializers.py:261-422, forward branch).

The ladder check transliterates the reference's init formulas + tanh/StepFlow
forward math into plain numpy and compares against our compiled flow, so the
spec construction, the softplus restriction handling and the gate pass-through
are all cross-checked against an independent implementation.
"""

import numpy as np
import pytest

from tgp.pytorch_tpu.flows.core import (
    flow_forward, init_flow_params, spec_from_list,
)
from tgp.pytorch_tpu.flows.generators import random_flow
from tgp.pytorch_tpu.flows.initializers import gaussianize, step_flow_ladder


def _ladder_numpy(f, K, lo, hi, s, remove_tails=False):
    """Reference math, independently: init values initializers.py:425-475;
    tanh forward fk = a + b*tanh((f0-c)/d) flow.py:642; StepFlow sums the
    steps and tanh members get the non-trainable pass-through gate
    (flow.py:1090-1101)."""
    diff = abs(hi - lo)
    pts = (np.linspace(lo, hi, K) if remove_tails
           else np.linspace(lo, hi, K + 2)[1:-1])
    out = np.zeros_like(f)
    for k in range(K):
        shift = lo if k == 0 else 0.0
        a = (diff / 2) / K + shift
        b = (diff / 2) / K
        c = pts[k]
        d = 1.0 / s
        out = out + a + b * np.tanh((f - c) / d)
    return out


@pytest.mark.parametrize("remove_tails", [False, True])
def test_step_flow_ladder_matches_reference_math(remove_tails):
    K, lo, hi, s = 5, -4.2, 3.1, 0.01
    spec, inits = spec_from_list(
        step_flow_ladder(K, (lo, hi), smoothness_scale=s,
                         remove_tails=remove_tails))
    params = init_flow_params(spec, inits)
    f = np.linspace(lo - 2.0, hi + 2.0, 400)
    ours = np.asarray(flow_forward(spec, params, f))
    theirs = _ladder_numpy(f, K, lo, hi, s, remove_tails)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=2e-4)


def test_step_flow_ladder_monotone_and_midpoint_fixed():
    K, lo, hi = 5, -4.2, 3.1
    spec, inits = spec_from_list(step_flow_ladder(K, (lo, hi), 0.01))
    params = init_flow_params(spec, inits)
    f = np.linspace(lo, hi, 600)
    y = np.asarray(flow_forward(spec, params, f))
    assert np.all(np.diff(y) > 0)  # b,d > 0 via softplus => strictly increasing
    # the step points are symmetric about the midpoint and the per-step tanh
    # contributions cancel there, so T(mid) == mid exactly by construction
    mid = 0.5 * (lo + hi)
    y_mid = float(flow_forward(spec, params, np.asarray([mid])).reshape(()))
    assert abs(y_mid - mid) < 1e-4


def test_random_flow_step_flow_branch():
    rng = (-2.0, 5.0)
    got = random_flow("step_flow", output_range=rng)
    assert got == step_flow_ladder(K=5, output_range=rng,
                                   smoothness_scale=0.01, remove_tails=False)
    spec, inits = spec_from_list(got)
    params = init_flow_params(spec, inits)
    out = np.asarray(flow_forward(spec, params, np.linspace(*rng, 50)))
    assert np.all(np.isfinite(out))
    # the reference's own branch reads y_train out of scope (flows.py:552);
    # we require the range explicitly instead
    with pytest.raises(ValueError, match="output_range"):
        random_flow("step_flow")


def test_gaussianize_affine_standardizes_marginal():
    rng = np.random.default_rng(0)
    y = 2.0 * rng.standard_normal(4000) + 1.0
    spec, inits = spec_from_list([("affine", {"init_a": 1.0, "init_b": 0.0})])
    params = init_flow_params(spec, inits)

    params, final_loss = gaussianize(spec, params, y, num_epochs=3000,
                                     lr=0.01, momentum=0.9)
    z = np.asarray(flow_forward(spec, params, y))
    assert abs(float(z.mean())) < 0.05
    assert abs(float(z.std()) - 1.0) < 0.05
    # optimal cross-entropy for an affine gaussianizer of Gaussian data is
    # 0.5*log(2*pi) + 0.5 + log(std_y) (differential entropy of y)
    target = 0.5 * np.log(2 * np.pi) + 0.5 + np.log(y.std())
    assert final_loss <= target + 0.05
