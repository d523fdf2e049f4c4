"""Optimizer-path equivalence for INPUT-DEPENDENT classification.

The ID hypernet flow path through the Bernoulli ELL had only unit-level
coverage; this test runs N epochs of our Trainer against the eager-torch
replica (tools/torch_replica_classification.py::id_sal_flow) from
IDENTICAL inits (the jax hypernet weights are copied into the torch
MLPs) on a tiny binary cell, fp64, with the full ID protocol machinery:

  * input-dependent SAL(1) hypernet flow (a,b = MLP(X), reference:
    code/dsp/models/flow.py:836-887,939-965),
  * weight decay 1e-5 on the hypernets only (code/main.py:274-288),
  * the two-phase kernel-hold schedule (torch add_param_group moment
    semantics at the switch) and global-norm clipping,
  * anchor scalars frozen out of the optimizer (the analogue of
    turn_off_initializer_parameters, flow.py:924-934).

dropout=0.0 makes the hypernets deterministic so the two trajectories
are comparable bit-for-bit up to fp64 rounding; the stochastic
(dropout>0) path is covered end-to-end by
benchmarks/classification_protocol.py --model ID_TGP and the PARITY.md
ID-classification rows.
"""

import math
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
_PREV_TORCH_DTYPE = torch.get_default_dtype()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

EPOCHS, HOLD = 40, 10
N, DX, M_IND, QUAD, WIDTH = 160, 3, 8, 16, 8


def _data():
    rng = np.random.RandomState(3)
    X = rng.randn(N, DX)
    logits = np.sin(2 * X[:, 0]) + X[:, 1] * X[:, 2]
    y = (logits + 0.4 * rng.randn(N) > 0).astype(np.float64).reshape(-1, 1)
    return X, y


def _make_spec_params(X, Z0):
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    lik = LikelihoodSpec("bernoulli", 1, quad_points=QUAD)
    np.random.seed(0)
    fl = G.SAL(1, input_dependent=True, input_dim=DX,
               hidden_activation="tanh", num_hidden_layers=1,
               dropout=0.0, hidden_dim=WIDTH, inference="MC_dropout")
    fspec, finits = spec_from_list(fl)
    spec = M.TGPSpec(Dy=1, Dx=DX, M=M_IND, N=float(N),
                     kernel=K.from_name("scale_rbf"), likelihood=lik,
                     flow=fspec)
    params = M.init_tgp_params(
        spec, X, Z0, variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        flow_inits=finits)
    return spec, params


def _ours(X, y, Z0, spec, params):
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.train import Trainer

    loaders = [DataLoader(ArrayDataset(X, y), 10000, seed=0)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=QUAD)
    sched = ([HOLD / EPOCHS, 1 - HOLD / EPOCHS],
             [[[0.0, "kernel"], [0.01, 1e-5, "net_"]],
              [[0.01, 1e-5, "net_"]]])
    tr.train(EPOCHS, 0.01, "adam", optimisation_schedule=sched,
             verbose_each=0, clip_norm=100.0)
    elbo, _, _ = M.elbo(spec, tr.params, jnp.asarray(X), jnp.asarray(y))
    return float(elbo)


def _copy_hypernets_into_torch(flow_params, torch_flow):
    """Load the jax hypernet weights (leading Dy=1 axis) into the torch
    SinhArcsinhFlow's NNets so both sides start identically."""
    from torch_replica import SinhArcsinhFlow

    sal_p = flow_params[0]  # the sinh_arcsinh step's params
    sal_t = [m for m in torch_flow.flows
             if isinstance(m, SinhArcsinhFlow)][0]
    for name, net in (("net_a", sal_t.NNets_a), ("net_b", sal_t.NNets_b)):
        linears = [m for m in net if isinstance(m, torch.nn.Linear)]
        layers = sal_p[name]["layers"]
        assert len(linears) == len(layers)
        for lin, lay in zip(linears, layers):
            W = np.asarray(lay["W"])[0]  # strip the Dy axis
            b = np.asarray(lay["b"])[0]
            with torch.no_grad():
                lin.weight.copy_(torch.tensor(W.T))
                lin.bias.copy_(torch.tensor(b))


def _replica(X, y, Z0, flow_params):
    from torch_replica_classification import SparseClassTGP
    from torch_replica import (AffineFlow, CompositeFlow, SinhArcsinhFlow)

    torch.set_default_dtype(torch.float64)
    try:
        Xt = torch.tensor(X)
        yt = torch.tensor(y)
        flow = CompositeFlow([
            SinhArcsinhFlow(0.0, 1.0, False,
                            hyper=(DX, WIDTH, 1, 0.0, "tanh")),
            AffineFlow(1.0, 0.0, False),
        ])
        _copy_hypernets_into_torch(flow_params, flow)
        model = SparseClassTGP(1, DX, M_IND, N, Z0, [flow], QUAD)
        kern = model.kernel_parameters()
        kern_ids = {id(p) for p in kern}
        nnets = [p for n, p in model.named_parameters() if "NNets" in n]
        nnet_ids = {id(p) for p in nnets}
        rest = [p for p in model.parameters()
                if id(p) not in kern_ids and id(p) not in nnet_ids]
        opt = torch.optim.Adam([
            {"params": rest, "lr": 0.01},
            {"params": nnets, "lr": 0.01, "weight_decay": 1e-5},
        ])
        for ep in range(EPOCHS):
            if ep == HOLD:
                opt.add_param_group({"params": kern, "lr": 0.01})
            mu, cov = model.marginal_qf(Xt)
            elbo = model.bernoulli_ell(yt, mu, cov, X=Xt) - model.kld()
            model.zero_grad()
            (-elbo).backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 100.0)
            opt.step()
        mu, cov = model.marginal_qf(Xt)
        final = model.bernoulli_ell(yt, mu, cov, X=Xt) - model.kld()
        return float(final.detach())
    finally:
        torch.set_default_dtype(_PREV_TORCH_DTYPE)


def test_id_binary_trajectory_matches_replica():
    X, y = _data()
    from tgp.pytorch_tpu.data import kmeans_centers

    Z0 = kmeans_centers(X, M_IND, n_init=10)
    spec, params = _make_spec_params(X, Z0)
    flow_params = jax.tree_util.tree_map(lambda v: np.asarray(v),
                                         params["flow"])
    ours = _ours(X, y, Z0, spec, params)
    ref = _replica(X, y, Z0, flow_params)
    assert math.isfinite(ours) and math.isfinite(ref)
    assert abs(ours - ref) / abs(ref) < 1e-5, (ours, ref)
