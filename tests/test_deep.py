"""Deep TGP (models/deep.py): single-layer equivalence with the shallow
model, end-to-end training through the Trainer, and estimator sanity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.models import deep as D
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.train import Trainer


def _toy(N=96, Dx=2, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(-2, 2, (N, Dx))
    # a step + slope composite — the classic DGP motivator
    y = np.where(X[:, :1] > 0, 1.0, -1.0) + 0.3 * X[:, 1:2] \
        + 0.05 * rng.randn(N, 1)
    return X, y


def test_single_layer_deep_equals_shallow_tgp():
    X, Y = _toy()
    N, Dx = X.shape
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(1))
    lsp = M.TGPSpec(Dy=1, Dx=Dx, M=8, N=float(N),
                    kernel=K.from_name("scale_rbf"),
                    likelihood=LikelihoodSpec("gaussian_flow", 1,
                                              quad_points=32), flow=fspec)
    dspec = D.DeepTGPSpec(layers=(lsp,), S_train=1)
    p_sh = M.init_tgp_params(lsp, X, X[:8], flow_inits=finits)
    p_dp = {"layers": [jax.tree_util.tree_map(lambda x: x, p_sh)]}

    e_sh = M.elbo(lsp, p_sh, jnp.asarray(X), jnp.asarray(Y))[0]
    e_dp = M.elbo(dspec, p_dp, jnp.asarray(X), jnp.asarray(Y))[0]
    # no inner layers -> no sampling -> must agree to fp noise
    np.testing.assert_allclose(float(e_dp), float(e_sh), rtol=1e-10)

    lp_sh = M.test_log_likelihood(lsp, p_sh, jnp.asarray(X), jnp.asarray(Y),
                                  jnp.ones(1))
    lp_dp = M.test_log_likelihood(dspec, p_dp, jnp.asarray(X),
                                  jnp.asarray(Y), jnp.ones(1))
    # deep estimator averages S_test identical copies -> exact agreement
    np.testing.assert_allclose(np.asarray(lp_dp), np.asarray(lp_sh),
                               rtol=1e-8)


def test_layer_width_mismatch_raises():
    k = K.from_name("scale_rbf")
    l1 = D.layer_spec(2, 3, 4, 10.0, k)
    l2 = D.layer_spec(2, 1, 4, 10.0, k,
                      likelihood=LikelihoodSpec("gaussian", 1))
    with pytest.raises(ValueError, match="width mismatch"):
        D.DeepTGPSpec(layers=(l1, l2))


def test_two_layer_deep_trains_end_to_end():
    X, Y = _toy(N=96)
    N, Dx = X.shape
    k = K.from_name("scale_rbf")
    inner = D.layer_spec(Dx, Dx, 10, float(N), k)        # identity mean
    np.random.seed(0)
    fspec, finits = spec_from_list(G.SAL(1))
    outer = M.TGPSpec(Dy=1, Dx=Dx, M=10, N=float(N), kernel=k,
                      likelihood=LikelihoodSpec("gaussian_flow", 1,
                                                quad_points=32),
                      flow=fspec, mean="zero")
    dspec = D.DeepTGPSpec(layers=(inner, outer), S_train=1, S_test=20)
    params = D.init_deep_params(dspec, X, X[:10], flow_inits=finits,
                                variance_scale=1e-5, noise_init=0.05,
                                kernel_init={"length_scale": 2.0,
                                             "kernel_scale": 2.0})
    # inner identity-mean W must be frozen
    from tgp.pytorch_tpu.train.trainer import frozen_param_labels
    labels = frozen_param_labels(dspec, params)
    froze = [s for p, v in zip(
        jax.tree_util.tree_leaves_with_path(labels),
        jax.tree_util.tree_leaves(labels)) if v
        for s in ["/".join(str(getattr(q, "key", getattr(q, "idx", q)))
                           for q in p[0])]]
    assert any(s.endswith("mean/W") for s in froze), froze

    loaders = [DataLoader(ArrayDataset(X, Y), 96, seed=0),
               DataLoader(ArrayDataset(X, Y), 96, shuffle=False)]
    tr = Trainer(dspec, params, loaders, Y_std=np.ones(1), S_test=20, seed=3)
    tr.train(300, 0.02, "adam", verbose_each=0)
    assert np.isfinite(np.asarray(tr.loss_curve)).all()
    assert tr.loss_curve[-1] > tr.loss_curve[0]

    m = tr.compute_metrics()["test"]
    assert np.isfinite(m["logL"]).all()
    # the step function is easy with 2 layers at 96 points: decent fit
    assert m["rmse"][0] < 0.5, m


def test_deep_predictive_moments_reasonable():
    X, Y = _toy(N=64)
    k = K.from_name("scale_rbf")
    inner = D.layer_spec(2, 2, 8, 64.0, k)
    outer = M.TGPSpec(Dy=1, Dx=2, M=8, N=64.0, kernel=k,
                      likelihood=LikelihoodSpec("gaussian", 1))
    dspec = D.DeepTGPSpec(layers=(inner, outer), S_test=16)
    params = D.init_deep_params(dspec, X, X[:8], variance_scale=1e-2)
    m1, m2, _, _ = M.predictive_distribution(dspec, params, jnp.asarray(X))
    assert m1.shape == (1, 64) and m2.shape == (1, 64)
    assert bool(jnp.all(m2 > 0))
    s, _, _ = M.sample_predictive(dspec, params, jnp.asarray(X), 16,
                                  jax.random.PRNGKey(0))
    assert s.shape == (1, 16, 64)


def _small_deep(X):
    N, Dx = X.shape
    np.random.seed(0)
    kern = K.from_name("scale_rbf")
    fspec, finits = spec_from_list(G.SAL(1))
    inner = D.layer_spec(Dx, Dx, 4, float(N), kern)
    outer = M.TGPSpec(Dy=1, Dx=Dx, M=4, N=float(N), kernel=kern,
                      likelihood=LikelihoodSpec("gaussian_flow", 1,
                                                quad_points=16),
                      flow=fspec)
    spec = D.DeepTGPSpec(layers=(inner, outer), S_train=2, S_test=5)
    params = D.init_deep_params(spec, X, X[:4].copy(), flow_inits=finits)
    return spec, params


def test_deep_test_log_likelihood_reduce_false():
    """reduce=False must return per-point (Dy, MB) densities through the
    DeepTGPSpec dispatch — the serving path masks padding rows host-side
    (round-5 review finding: the kwarg was silently dropped)."""
    X, Y = _toy(N=32)
    spec, params = _small_deep(X)
    rng = jax.random.PRNGKey(0)
    per_point = M.test_log_likelihood(spec, params, X, Y, np.ones(1),
                                      rng=rng, reduce=False)
    total = M.test_log_likelihood(spec, params, X, Y, np.ones(1), rng=rng)
    assert per_point.shape == (1, X.shape[0])
    np.testing.assert_allclose(np.asarray(per_point.sum(axis=-1)),
                               np.asarray(total), rtol=1e-10)


def test_deep_sample_marginal_and_posterior_ci():
    """sample_marginal dispatches to the deep model (posterior-CI surface;
    round-5 review finding: it crashed on spec.M)."""
    from tgp.pytorch_tpu.models.utils import confidence_intervals
    X, _ = _toy(N=24)
    spec, params = _small_deep(X)
    fk, mu, var, f0 = M.sample_marginal(spec, params, X, 3,
                                        jax.random.PRNGKey(1))
    assert fk.shape == (3, 1, X.shape[0]) and f0.shape == fk.shape
    assert np.isfinite(np.asarray(fk)).all()
    cis = confidence_intervals(spec, params, X, [0.025, 0.5, 0.975], 16,
                               jax.random.PRNGKey(2),
                               distribution="posterior")
    lo, med, hi = cis[0]
    assert lo.shape == (X.shape[0],)
    assert (np.asarray(lo) <= np.asarray(hi)).all()
