"""Optimizer-path equivalence on the classification protocol.

The analytic likelihood cross-checks (test_torch_crosscheck_likelihoods)
verify the Bernoulli ELBO at one parameter point; this test verifies the
*training trajectory* — grouped Adam with the two-phase kernel-hold
schedule (lr=0 exclusion in phase 1, torch `add_param_group` moment
semantics at the switch) and global-norm clipping — by running N epochs
of our Trainer against the eager-torch replica
(tools/torch_replica_classification.py) from identical inits on a tiny
binary cell, fp64.  Any divergence in the update rule, the phase switch,
or the clip scaling compounds over epochs and fails the final-ELBO
comparison.

reference protocol: benchmarks/classification_protocol.py (two-phase
hold_K_params schedule per Hensman 2015b; reference launcher
trainer_base.py:250-299).
"""

import math
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
# capture BEFORE importing the replica tool (whose import sets fp64)
_PREV_TORCH_DTYPE = torch.get_default_dtype()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

EPOCHS, HOLD = 40, 10
N, DX, M_IND, QUAD = 160, 3, 8, 16


def _data():
    rng = np.random.RandomState(3)
    X = rng.randn(N, DX)
    logits = np.sin(2 * X[:, 0]) + X[:, 1] * X[:, 2]
    y = (logits + 0.4 * rng.randn(N) > 0).astype(np.float64).reshape(-1, 1)
    return X, y


def _ours(X, y, Z0):
    from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.train import Trainer
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list

    lik = LikelihoodSpec("bernoulli", 1, quad_points=QUAD)
    fspec, finits = spec_from_list(G.build_chain("SAL_InvBCL", 1))
    spec = M.TGPSpec(Dy=1, Dx=DX, M=M_IND, N=float(N),
                     kernel=K.from_name("scale_rbf"), likelihood=lik,
                     flow=fspec)
    params = M.init_tgp_params(
        spec, X, Z0, variance_scale=1e-5,
        kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
        flow_inits=finits)
    loaders = [DataLoader(ArrayDataset(X, y), 10000, seed=0)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=QUAD)
    sched = ([HOLD / EPOCHS, 1 - HOLD / EPOCHS], [[[0.0, "kernel"]], None])
    tr.train(EPOCHS, 0.01, "adam", optimisation_schedule=sched,
             verbose_each=0, clip_norm=100.0)
    Xd = jnp.asarray(X)
    Yd = jnp.asarray(y)
    elbo, _, _ = M.elbo(spec, tr.params, Xd, Yd)
    return float(elbo)


def _replica(X, y, Z0):
    from torch_replica_classification import SparseClassTGP, sal_invbcl_flow

    torch.set_default_dtype(torch.float64)
    try:
        Xt = torch.tensor(X)
        yt = torch.tensor(y)
        model = SparseClassTGP(1, DX, M_IND, N, Z0, [sal_invbcl_flow()], QUAD)
        kern = model.kernel_parameters()
        kern_ids = {id(p) for p in kern}
        rest = [p for p in model.parameters() if id(p) not in kern_ids]
        opt = torch.optim.Adam([{"params": rest, "lr": 0.01}])
        for ep in range(EPOCHS):
            if ep == HOLD:
                opt.add_param_group({"params": kern, "lr": 0.01})
            mu, cov = model.marginal_qf(Xt)
            elbo = model.bernoulli_ell(yt, mu, cov) - model.kld()
            # model-wide: hold-phase kernel grads are outside the optimizer
            # but inside the clip norm
            model.zero_grad()
            (-elbo).backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), 100.0)
            opt.step()
        mu, cov = model.marginal_qf(Xt)
        final = model.bernoulli_ell(yt, mu, cov) - model.kld()
        return float(final.detach())
    finally:
        torch.set_default_dtype(_PREV_TORCH_DTYPE)


def test_binary_trajectory_matches_replica():
    X, y = _data()
    from tgp.pytorch_tpu.data import kmeans_centers

    Z0 = kmeans_centers(X, M_IND, n_init=10)
    ours = _ours(X, y, Z0)
    ref = _replica(X, y, Z0)
    # identical math + identical update rule: the residual is fp64
    # rounding, the clip-eps difference (1e-12 ours vs torch's 1e-6), and
    # torch BCELoss's -100 log clamp vs our exact log_ndtr — the clamp
    # only binds past |fk| ~ 13.9, which unsaturated 40-epoch posteriors
    # never reach (it WOULD separate the implementations on a cell whose
    # warped quadrature nodes saturate; both are then 'correct', ours
    # exactly)
    assert math.isfinite(ours) and math.isfinite(ref)
    assert abs(ours - ref) / abs(ref) < 1e-5, (ours, ref)


def test_categorical_replica_matches_shared_draws():
    """One-point equivalence of the replica's categorical branch (the
    Dy=3 batched marginal_qf, the BCL_AL/ArcsinhFlow warp, and the MC
    softmax ELL) against the framework at identical parameters with
    shared reparameterization draws — the categorical analogue of the
    analytic Bernoulli cross-checks, covering the replica tool itself."""
    from torch_replica_classification import SparseClassTGP, bcl_al_flow
    from tgp.pytorch_tpu.data import kmeans_centers
    from tgp.pytorch_tpu.ops import kernels as K
    from tgp.pytorch_tpu.models import tgp as M
    from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
    from tgp.pytorch_tpu.flows import generators as G, spec_from_list
    from tgp.pytorch_tpu.flows.core import flow_forward

    torch.set_default_dtype(torch.float64)
    try:
        rng = np.random.RandomState(7)
        C, MB, S = 3, 24, 16
        X = rng.randn(MB, DX)
        Y = rng.randint(0, C, size=MB).astype(np.float64)
        Z0 = kmeans_centers(X, M_IND, n_init=2)

        flows = []
        for _ in range(C):  # identical per-class inits, like the tool
            np.random.seed(0)
            flows.append(bcl_al_flow())
        model = SparseClassTGP(C, DX, M_IND, MB, Z0, flows, S)
        mu_t, cov_t = model.marginal_qf(torch.tensor(X))

        np.random.seed(0)
        fspec, finits = spec_from_list(G.build_chain("BCL_AL", 1))
        lik = LikelihoodSpec("categorical", C, quad_points=S, num_classes=C)
        spec = M.TGPSpec(Dy=C, Dx=DX, M=M_IND, N=float(MB),
                         kernel=K.from_name("scale_rbf"), likelihood=lik,
                         flow=fspec)
        params = M.init_tgp_params(
            spec, X, Z0, variance_scale=1e-5,
            kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
            flow_inits=finits)
        X3 = jnp.broadcast_to(jnp.asarray(X)[None], (C, MB, DX))
        mu_j, var_j = M.marginal_qf(spec, params, X3, diagonal=True)
        np.testing.assert_allclose(np.asarray(mu_j), mu_t.detach().numpy(),
                                   rtol=1e-9, atol=1e-12)
        # Kxx - Qxx cancels O(ks) terms down to O(1e-5) at init, so the
        # two equivalent formulations differ by absolute fp64 rounding
        np.testing.assert_allclose(np.asarray(var_j), cov_t.detach().numpy(),
                                   rtol=1e-6, atol=1e-8)

        key = jax.random.PRNGKey(11)
        eps = np.asarray(jax.random.normal(key, (S, C, MB), jnp.float64))

        def warp(f):
            return jax.vmap(
                lambda fp, fd: flow_forward(fspec, fp, fd),
                in_axes=(0, 1), out_axes=1)(params["flow"], f)

        ours = float(_cat_ell_with_eps(lik, Y, mu_j, var_j, warp, eps))
        theirs = float(model.categorical_ell(
            torch.tensor(Y), mu_t, cov_t, S,
            eps=torch.tensor(eps)).detach())
        assert abs(ours - theirs) / abs(theirs) < 1e-6, (ours, theirs)
    finally:
        torch.set_default_dtype(_PREV_TORCH_DTYPE)


def _cat_ell_with_eps(lik, Y, mu, var, warp, eps):
    """The framework's categorical ELL with the draws fixed — the same
    computation as likelihoods.classification.categorical_ell with its
    jax.random.normal replaced by `eps` (shared with the torch side)."""
    f0 = mu[None] + jnp.sqrt(var)[None] * jnp.asarray(eps)
    fk = warp(f0)
    logits = jnp.moveaxis(fk, 1, -1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(
        logp, jnp.asarray(Y)[None, :, None].astype(jnp.int32), axis=-1)[..., 0]
    return jnp.sum(jnp.mean(ll, axis=0))
