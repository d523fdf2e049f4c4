"""Mean-field-Gaussian VI hypernets: KLD wiring + optimizer-path equivalence.

The VI inference mode (BNN local reparameterization, reference:
code/dsp/models/BNN_VILR.py:10-92, selected at flow.py:696-714) had only
unit-level coverage; these tests verify

  * the flow-KLD term itself: flows_kld == the torch replica's
    CompositeFlow.KLD() at identical parameters (GAUSS_KLD,
    BNN_VILR.py:77-83, added to the ELBO at sparse_MF_SP.py:573-576), and
  * the TRAINING TRAJECTORY through the Gaussian-flow quadrature ELBO with
    the KLD term active: N epochs of our Trainer vs the eager-torch
    replica from identical inits.

Determinism trick: all logvars are set to -200 and FROZEN (substring
'logvar' at lr=0 in the framework; excluded from the torch optimizer), so
the local-reparam sample mu + eps*sqrt(var) equals mu to below fp64
resolution (sqrt(var) ~ 1e-44) while the KLD's mean-gradient
m/prior_var still shapes the trajectory on both sides.  The stochastic
(trained-variance) path is covered end-to-end by the PARITY.md VI rows.
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
LOGVAR = -200.0


def _data():
    rng = np.random.RandomState(5)
    X = rng.randn(N, DX)
    y = (np.sinh(0.6 * X[:, 0]) + 0.3 * X[:, 1]
         + 0.2 * rng.randn(N)).reshape(-1, 1)
    return X, y


def _make_spec_params(X, Z0):
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    lik = LikelihoodSpec("gaussian_flow", 1, quad_points=QUAD)
    np.random.seed(0)
    fl = G.SAL(1, input_dependent=True, input_dim=DX,
               hidden_activation="tanh", num_hidden_layers=1,
               dropout=0.0, hidden_dim=WIDTH,
               inference="mean_field_gaussian")
    fspec, finits = spec_from_list(fl)
    spec = M.TGPSpec(Dy=1, Dx=DX, M=M_IND, N=float(N),
                     kernel=K.from_name("scale_rbf"), likelihood=lik,
                     flow=fspec)
    params = M.init_tgp_params(
        spec, X, Z0, variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        noise_init=0.05, flow_inits=finits)
    # pin every logvar to LOGVAR -> deterministic local-reparam samples
    params["flow"] = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.full_like(v, LOGVAR)
                      if "logvar" in "/".join(str(k) for k in p) else v),
        params["flow"])
    return spec, params


def _copy_into_torch(flow_params, torch_flow):
    from torch_replica import SinhArcsinhFlow

    sal_p = flow_params[0]
    sal_t = [m for m in torch_flow.flows
             if isinstance(m, SinhArcsinhFlow)][0]
    for name, net in (("net_a", sal_t.NNets_a), ("net_b", sal_t.NNets_b)):
        for lay_t, lay_j in zip(net.layers, sal_p[name]["layers"]):
            with torch.no_grad():
                for k in ("w_mean", "w_logvar", "b_mean", "b_logvar"):
                    getattr(lay_t, k).copy_(
                        torch.tensor(np.asarray(lay_j[k])[0]))


def _torch_model(X, Z0, flow_params):
    from torch_replica import SparseTGP, sal_flow

    flow = sal_flow(1, hyper=(DX, WIDTH, 1, 0.0, "tanh"), inference="vi")
    _copy_into_torch(flow_params, flow)
    return SparseTGP(DX, M_IND, N, Z0, flow, quad_points=QUAD)


def test_flow_kld_matches_replica():
    X, y = _data()
    from tgp.pytorch_tpu.data import kmeans_centers
    from tgp.pytorch_tpu.models import tgp as M

    torch.set_default_dtype(torch.float64)
    try:
        Z0 = kmeans_centers(X, M_IND, n_init=2)
        spec, params = _make_spec_params(X, Z0)
        ours = float(M.flows_kld(spec, params))
        model = _torch_model(X, Z0, jax.tree_util.tree_map(np.asarray,
                                                           params["flow"]))
        theirs = float(model.flow.KLD().detach())
        assert ours > 0.0
        assert abs(ours - theirs) / theirs < 1e-10, (ours, theirs)
    finally:
        torch.set_default_dtype(_PREV_TORCH_DTYPE)


def _ours(X, y, spec, params):
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.train import Trainer

    loaders = [DataLoader(ArrayDataset(X, y), 10000, seed=0)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=QUAD)
    groups = [[0.0, "logvar"], [0.01, 1e-5, "net_"]]
    sched = ([HOLD / EPOCHS, 1 - HOLD / EPOCHS],
             [[[0.0, "kernel"]] + groups, groups])
    tr.train(EPOCHS, 0.01, "adam", optimisation_schedule=sched,
             verbose_each=0, clip_norm=100.0)
    elbo, _, _ = M.elbo(spec, tr.params, jnp.asarray(X), jnp.asarray(y),
                        rng=jax.random.PRNGKey(0))
    return float(elbo)


def _replica(X, y, Z0, flow_params):
    torch.set_default_dtype(torch.float64)
    try:
        Xt = torch.tensor(X)
        yt = torch.tensor(y)
        model = _torch_model(X, Z0, flow_params)
        kern = [model.raw_ls, model.raw_ks]
        kern_ids = {id(p) for p in kern}
        logvars = [p for n, p in model.named_parameters() if "logvar" in n]
        lv_ids = {id(p) for p in logvars}
        nnets = [p for n, p in model.named_parameters()
                 if "NNets" in n and id(p) not in lv_ids]
        nnet_ids = {id(p) for p in nnets}
        rest = [p for p in model.parameters()
                if id(p) not in kern_ids and id(p) not in nnet_ids
                and id(p) not in lv_ids]
        opt = torch.optim.Adam([
            {"params": rest, "lr": 0.01},
            {"params": nnets, "lr": 0.01, "weight_decay": 1e-5},
        ])
        for ep in range(EPOCHS):
            if ep == HOLD:
                opt.add_param_group({"params": kern, "lr": 0.01})
            elbo, _, _ = model.elbo(Xt, yt)
            model.zero_grad()
            (-elbo).backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 100.0)
            opt.step()
        final, _, _ = model.elbo(Xt, yt)
        return float(final.detach())
    finally:
        torch.set_default_dtype(_PREV_TORCH_DTYPE)


def test_vi_anchor_fit_shrinks_output_variance():
    """The identity anchor fit must go through the SAMPLED VI forward
    (reference forward_initializer, flow.py:914-915: is_initializing=False)
    so the MSE loss drives the induced OUTPUT variance down from its
    weight-variance~1 init (BNN_VILR.py:20-23).  Regression: fitting means
    only leaves the sampled outputs with ~unit scatter and the first
    training ELBO explodes (~-1e23 on boston, NaN in fp32 on TPU).

    Asserted on the sampled outputs, not per-leaf logvars: in the
    reference-depth VI net (num_H+1 hidden layers) a layer can keep
    weight variance ~1 when its inputs are small — only the induced
    output variance is load-bearing."""
    from tgp.pytorch_tpu.flows.initializers import fit_hypernet_to_anchors
    from tgp.pytorch_tpu.flows.hypernet import apply_hypernet
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.data import kmeans_centers

    X, y = _data()
    Z0 = kmeans_centers(X, M_IND, n_init=2)
    spec, params = _make_spec_params(X, Z0)
    # undo the test-harness logvar pin: restore the reference's ~N(0,1e-40)
    # init so the fit starts from weight variance ~1
    params["flow"] = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.zeros_like(v)
                      if "logvar" in "/".join(str(k) for k in p) else v),
        params["flow"])
    fp0 = jax.tree_util.tree_map(lambda x: x[0], params["flow"])

    def out_std(fp):
        step = spec.flow[0]
        # BOTH hypernets of the SAL step (net_a and net_b) must calibrate
        return max(
            float(np.stack([
                np.asarray(apply_hypernet(step.hypernet, fp[0][net], X,
                                          rng=jax.random.PRNGKey(i),
                                          stochastic=True))
                for i in range(16)]).std(axis=0).mean())
            for net in ("net_a", "net_b"))

    std_before = out_std(fp0)
    # production epoch count (initializers.py default / sweep.py)
    fp0, loss = fit_hypernet_to_anchors(spec.flow, fp0, [X],
                                        num_epochs=2000, noise_var=0.0)
    std_after = out_std(fp0)
    assert std_before > 1.0, std_before
    assert std_after < 0.35, \
        f"anchor fit left sampled-output scatter high: {std_after}"
    # the sampled-forward MSE has an irreducible sampling-variance floor;
    # the load-bearing assertions are the variance shrink and finite ELBO
    assert loss < 2.0, loss
    params["flow"] = jax.tree_util.tree_map(
        lambda x: jnp.stack([x] * 1), fp0)
    e, _, _ = M.elbo(spec, params, jnp.asarray(X), jnp.asarray(y),
                     rng=jax.random.PRNGKey(0))
    assert math.isfinite(float(e)) and float(e) > -1e5, float(e)


def test_vi_trajectory_matches_replica():
    X, y = _data()
    from tgp.pytorch_tpu.data import kmeans_centers

    Z0 = kmeans_centers(X, M_IND, n_init=10)
    spec, params = _make_spec_params(X, Z0)
    flow_params = jax.tree_util.tree_map(np.asarray, params["flow"])
    ours = _ours(X, y, spec, params)
    ref = _replica(X, y, Z0, flow_params)
    assert math.isfinite(ours) and math.isfinite(ref)
    assert abs(ours - ref) / abs(ref) < 1e-5, (ours, ref)
