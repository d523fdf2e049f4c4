"""Data-layer + trainer tests (UCI splits, param groups, short e2e run)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.data import return_dataset, kmeans_centers, DataLoader, ArrayDataset
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.train import Trainer, build_grouped_optimizer
from tgp.pytorch_tpu.train.trainer import frozen_param_labels
from tgp.pytorch_tpu.flows import generators as G, spec_from_list


def test_boston_split_fixed_and_normalized():
    loaders, dc = return_dataset("boston", 10000, None, seed=1)
    assert dc["N_tr"] == 455 and dc["Dx"] == 13 and dc["Dy"] == 1
    # train z-scored with train stats
    assert abs(dc["X_tr"].mean()) < 1e-10
    assert abs(dc["Y_tr"].mean()) < 1e-10
    # split must be identical across loads (pickle-committed)
    _, dc2 = return_dataset("boston", 10000, None, seed=1)
    np.testing.assert_array_equal(dc["X_tr"], dc2["X_tr"])
    # different seed -> different split
    _, dc3 = return_dataset("boston", 10000, None, seed=2)
    assert not np.array_equal(dc["X_tr"], dc3["X_tr"])


def test_validation_split_reproducible():
    _, dc = return_dataset("boston", 10000, use_validation=(0, 100), seed=1)
    assert dc["N_tr"] == 355
    _, dc2 = return_dataset("boston", 10000, use_validation=(0, 100), seed=1)
    np.testing.assert_array_equal(dc["X_tr"], dc2["X_tr"])


def test_energy_uses_second_to_last_column():
    _, dc = return_dataset("energy", 10000, None, seed=1)
    assert dc["Dx"] == 8  # energy.csv has 10 columns; X excludes last two


def test_dataloader_shuffles_deterministically():
    ds = ArrayDataset(np.arange(20).reshape(10, 2), np.arange(10).reshape(10, 1))
    b1 = [x.copy() for x, _ in DataLoader(ds, 4, seed=7)]
    b2 = [x.copy() for x, _ in DataLoader(ds, 4, seed=7)]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)
    assert sum(len(x) for x in b1) == 10


def test_kmeans_seeded():
    X = np.random.RandomState(0).randn(100, 3)
    Z1 = kmeans_centers(X, 5, n_init=10, seed=0)
    Z2 = kmeans_centers(X, 5, n_init=10, seed=0)
    np.testing.assert_array_equal(Z1, Z2)


# ---------------------------------------------------------------- optimizer

def _tiny_model(flow=None, lik="gaussian", mean="zero"):
    rng = np.random.RandomState(0)
    X = rng.randn(30, 3)
    Y = rng.randn(30, 1)
    flow_inits = None
    if flow is not None:
        fspec, flow_inits = spec_from_list(flow)
    else:
        fspec = M.IDENTITY_SPEC
    spec = M.TGPSpec(Dy=1, Dx=3, M=5, N=30.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec(lik, 1, quad_points=16),
                     flow=fspec, mean=mean)
    params = M.init_tgp_params(spec, X, X[:5], flow_inits=flow_inits)
    return spec, params, X, Y


def test_param_group_substring_matching_and_freezing():
    spec, params, X, Y = _tiny_model(flow=G.SAL(1), lik="gaussian_flow")
    opt, labels = build_grouped_optimizer(
        params, [[0.0, "q_mu"], [0.05, 1e-4, "flow"]], 0.01, "adam")
    flat = jax.tree_util.tree_leaves_with_path(labels)
    lab = {"/".join(str(getattr(p, 'key', getattr(p, 'idx', p))) for p in path): v
           for path, v in flat}
    assert lab["q_mu"] == "__frozen__"
    assert all(v == "group1" for k, v in lab.items() if k.startswith("flow"))
    assert lab["Z"] == "__global__"


def test_identity_mean_W_frozen():
    spec, params, X, Y = _tiny_model(mean="identity")
    frozen = frozen_param_labels(spec, params)
    assert jax.tree_util.tree_leaves(frozen["mean"]) == [True]


def test_hypernet_anchors_frozen():
    fl = G.SAL(1, input_dependent=True, input_dim=3, hidden_dim=4,
               inference="MC_dropout", dropout=0.5)
    spec, params, X, Y = _tiny_model(flow=fl, lik="gaussian_flow")
    frozen = frozen_param_labels(spec, params)
    step0 = frozen["flow"][0]
    assert step0["a"] is True and step0["b"] is True
    assert not any(jax.tree_util.tree_leaves(step0["net_a"]))


def test_trainer_improves_elbo_and_freezes():
    spec, params, X, Y = _tiny_model(mean="identity")
    loaders = [DataLoader(ArrayDataset(X, Y), 30, seed=0),
               DataLoader(ArrayDataset(X, Y), 30, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=20)
    W_before = np.asarray(tr.params["mean"]["W"]).copy()
    tr.train(40, 0.05, "adam", verbose_each=0)
    assert float(tr.loss_curve[-1]) > float(tr.loss_curve[0])
    np.testing.assert_array_equal(np.asarray(tr.params["mean"]["W"]), W_before)
    m = tr.compute_metrics()
    assert np.isfinite(m["test"]["logL"]).all()


def test_trainer_schedule_phases():
    spec, params, X, Y = _tiny_model()
    loaders = [DataLoader(ArrayDataset(X, Y), 30, seed=0)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1))
    Z0 = np.asarray(tr.params["Z"]).copy()
    # phase 1: freeze everything except likelihood; phase 2: all free
    sched = ([0.5, 0.5], [[[0.0, "Z"], [0.0, "q_"], [0.0, "kernel"]], None])
    tr.train(20, 0.05, "adam", optimisation_schedule=sched, verbose_each=0)
    assert not np.array_equal(np.asarray(tr.params["Z"]), Z0)  # phase 2 moved Z


@pytest.mark.parametrize("opt", ["adam_W", "adam_R"])
def test_trainer_adam_family_schedule_carries(opt):
    """adam_W/adam_R now ride the grouped path: a two-phase schedule must
    train, improve the ELBO, and carry moment state across the boundary
    (state object identity: phase 2 starts from phase 1's GroupAdamState)."""
    from tgp.pytorch_tpu.train import group_adam as GA
    spec, params, X, Y = _tiny_model()
    loaders = [DataLoader(ArrayDataset(X, Y), 30, seed=0)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1))
    sched = ([0.5, 0.5], [[[0.0, "Z"]], None])
    tr.train(20, 0.01, opt, optimisation_schedule=sched, verbose_each=0)
    assert float(tr.loss_curve[-1]) > float(tr.loss_curve[0])
    assert isinstance(tr._opt_state_carry, GA.GroupAdamState)
    assert tr._opt_state_kind == opt
    # a later train() call with a DIFFERENT kind must reset, not reuse
    tr.train(4, 0.05, "adam", verbose_each=0)
    assert tr._opt_state_kind == "adam"


def test_boston_svgp_converges_toward_reference():
    # Oracle-anchored end-to-end gate (VERDICT r2 item 9): runs in the
    # DEFAULT suite (~25 s CPU) so accuracy regressions fail plain pytest.
    # CPU-runnable acceptance check toward README.md:66 (NLL 2.862/RMSE 4.229)
    loaders, dc = return_dataset("boston", 10000, None, seed=1)
    Z0 = kmeans_centers(dc["X_tr"], 5, n_init=10)
    spec = M.svgp_spec(Dy=1, Dx=dc["Dx"], M=5, N=float(dc["N_tr"]),
                       kernel=K.from_name("scale_rbf"),
                       likelihood=LikelihoodSpec("gaussian", 1, quad_points=100))
    params = M.init_tgp_params(spec, dc["X_tr"], Z0, variance_scale=1e-5,
                               kernel_init={"length_scale": 2.0, "kernel_scale": 2.0},
                               noise_init=0.05)
    tr = Trainer(spec, params, loaders, dc["Y_std"], S_test=100)
    tr.train(1500, 0.01, "adam", verbose_each=0)
    m = tr.compute_metrics()
    assert -m["test"]["logL"][0] < 3.1
    assert m["test"]["rmse"][0] < 4.8


def test_boston_tgp_flows_converges_toward_reference():
    # TGP acceptance gate (VERDICT r3 item 6): the quadrature/flow ELBO
    # path (SAL x2 marginal flow through the GH Gaussian-flow ELL) gets the
    # same default-suite NLL-ceiling treatment as the SVGP gate above —
    # ~30 s CPU; a regression in the flow warp, quadrature constants, or
    # the N/MB ELL scaling fails plain pytest.  Oracle: README.md:67
    # (TGP M=5 NLL 2.861 / RMSE 4.228 at the full 15000-epoch protocol).
    loaders, dc = return_dataset("boston", 10000, None, seed=1)
    Z0 = kmeans_centers(dc["X_tr"], 5, n_init=10)
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(2))
    spec = M.TGPSpec(Dy=1, Dx=dc["Dx"], M=5, N=float(dc["N_tr"]),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian_flow", 1,
                                               quad_points=50),
                     flow=fspec)
    params = M.init_tgp_params(spec, dc["X_tr"], Z0, variance_scale=1e-5,
                               kernel_init={"length_scale": 2.0,
                                            "kernel_scale": 2.0},
                               noise_init=0.05, flow_inits=finits)
    tr = Trainer(spec, params, loaders, dc["Y_std"], S_test=50)
    tr.train(1500, 0.01, "adam", verbose_each=0)
    m = tr.compute_metrics()
    assert -m["test"]["logL"][0] < 3.1, m["test"]
    assert m["test"]["rmse"][0] < 4.8, m["test"]
