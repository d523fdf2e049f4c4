"""Shared experiment-layer arch dispatch (experiments/flow_arch.py):
sweep.py and battery.py both route through it; these tests pin the helper
outputs to direct generator construction so the shared path cannot drift
from the sweep tables."""

from __future__ import annotations

import sys

import numpy as np
import pytest

sys.path.insert(0, "experiments")

import exp_config as EC
import flow_arch as FA

from tgp.pytorch_tpu.flows import generators as G, spec_from_list


@pytest.mark.parametrize("dataset", list(EC.TGP_REGRESSION_SWEEP)[:9])
def test_point_flow_matches_direct_construction(dataset):
    arch, nb, ns = FA.resolve_tgp_arch(dataset)
    assert (arch, nb, ns) == EC.TGP_REGRESSION_SWEEP[dataset]
    if FA.is_step_arch(arch):
        np.random.seed(0)
        got = FA.make_step_gen(arch, nb, ns)()
        np.random.seed(0)
        gen = getattr(G, arch)
        want = gen(nb, add_f0=True) if ns is None else gen(nb, ns,
                                                           add_f0=True)
    else:
        np.random.seed(0)
        got_spec, got_inits = FA.build_point_flow(arch, nb)
        np.random.seed(0)
        fl = (getattr(G, arch)(nb)
              if arch in ("SAL", "ArcSL", "BoxCoxL", "InverseBoxCoxL",
                          "Affine") else G.build_chain(arch, nb))
        want_spec, want_inits = spec_from_list(fl)
        assert got_spec == want_spec
        assert str(got_inits) == str(want_inits)
        return
    assert str(got) == str(want)


@pytest.mark.parametrize("dataset", ["boston", "power", "protein"])
def test_id_flow_matches_direct_construction(dataset):
    nb, act, nh, dr, bn, width = EC.ID_TGP_REGRESSION_SWEEP[dataset]
    np.random.seed(0)
    got_spec, got_inits = FA.build_id_flow(dataset, Dx=5)
    np.random.seed(0)
    fl = G.SAL(nb, input_dependent=True, input_dim=5,
               hidden_activation=act, num_hidden_layers=nh, dropout=dr,
               batch_norm=bn, hidden_dim=width, inference="MC_dropout")
    want_spec, want_inits = spec_from_list(fl)
    assert got_spec == want_spec
    assert str(got_inits) == str(want_inits)


def test_return_hyperparams_sweep_fallback():
    # datasets without a committed HYPERPARAMS entry resolve to the paper
    # sweep tables so experiments/main.py dispatches the whole grid
    hp = EC.return_hyperparams("TGP", "energy")
    assert (hp["flow_arch"], hp["num_blocks"], hp["num_steps"]) == \
        EC.TGP_REGRESSION_SWEEP["energy"]
    hp = EC.return_hyperparams("TGP", "naval")
    assert (hp["flow_arch"], hp["num_blocks"]) == ("SAL_InvBCL", 1)
    hp = EC.return_hyperparams("ID_TGP", "energy")
    nb, act, nh, dr, bn, width = EC.ID_TGP_REGRESSION_SWEEP["energy"]
    assert hp == dict(flow_arch="SAL", num_blocks=nb, num_steps=None,
                      flow_hidden_act=act, flow_num_hidden_layers=nh,
                      flow_DR=dr, flow_BN=bn, flow_hidden_dim=width,
                      flow_inference="MC_dropout")
    # explicit entries still take precedence over the sweep fallback
    assert EC.return_hyperparams("TGP", "boston")["flow_arch"] == "StepTanhL"
    with pytest.raises(KeyError):
        EC.return_hyperparams("TGP", "not_a_dataset")


def test_arch_flag_and_overrides():
    assert FA.parse_arch_flag("StepTanhL:10:2") == ("StepTanhL", 10, 2)
    assert FA.parse_arch_flag("SAL_BCL:2") == ("SAL_BCL", 2, None)
    arch, nb, ns = FA.resolve_tgp_arch("boston",
                                       arch_override=("StepAllL", 2, None))
    assert (arch, nb, ns) == ("StepAllL", 2, None)
    with pytest.raises(ValueError, match="NUM_STEPS"):
        FA.resolve_tgp_arch("boston", arch_override=("StepTanhL", 10, None))
