"""L-BFGS with zoom linesearch (reference offers torch.optim.LBFGS,
code/dsp/trainers/optimizers.py:29): quadratic convergence + an SVGP fit
through the Trainer, and loud rejections where it can't apply."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.train import Trainer
from tgp.pytorch_tpu.train.optimizers import lbfgs_optimizer


def test_lbfgs_solves_quadratic_in_few_iters():
    A = jnp.array([[3.0, 0.5], [0.5, 1.0]])
    b = jnp.array([1.0, -2.0])

    def f(x):
        return 0.5 * x @ A @ x - b @ x

    opt = lbfgs_optimizer()
    x = jnp.zeros(2)
    state = opt.init(x)
    for _ in range(10):
        val, grad = jax.value_and_grad(f)(x)
        updates, state = opt.update(grad, state, x, value=val, grad=grad,
                                    value_fn=f)
        x = optax.apply_updates(x, updates)
    x_star = jnp.linalg.solve(A, b)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_star), atol=1e-8)


def _svgp(N=48):
    rng = np.random.RandomState(0)
    X = rng.randn(N, 2)
    Y = (np.sin(X[:, :1]) + 0.05 * rng.randn(N, 1))
    spec = M.TGPSpec(Dy=1, Dx=2, M=8, N=float(N),
                     kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("gaussian", 1))
    params = M.init_tgp_params(spec, X, X[:8])
    return spec, params, X, Y


def test_lbfgs_trains_svgp_beyond_adam_at_equal_steps():
    spec, params, X, Y = _svgp()
    copy = lambda p: jax.tree_util.tree_map(lambda x: np.array(x, copy=True), p)
    loaders = lambda: [DataLoader(ArrayDataset(X, Y), 64, seed=0),
                       DataLoader(ArrayDataset(X, Y), 64, shuffle=False)]

    tr_l = Trainer(spec, copy(params), loaders(), Y_std=np.ones(1), S_test=5)
    tr_l.train(60, 0.0, "lbfgs", verbose_each=0)
    elbo_lbfgs = float(tr_l.loss_curve[-1])
    assert np.isfinite(elbo_lbfgs)

    tr_a = Trainer(spec, copy(params), loaders(), Y_std=np.ones(1), S_test=5)
    tr_a.train(60, 0.01, "adam", verbose_each=0)
    elbo_adam = float(tr_a.loss_curve[-1])

    # a second-order solver on a smooth 48-point full-batch ELBO must beat
    # 60 adam steps comfortably
    assert elbo_lbfgs > elbo_adam, (elbo_lbfgs, elbo_adam)

    m = tr_l.compute_metrics()["test"]
    assert np.isfinite(m["logL"]).all()


def test_lbfgs_rejects_schedules_and_minibatch():
    spec, params, X, Y = _svgp()
    loaders = [DataLoader(ArrayDataset(X, Y), 64, seed=0),
               DataLoader(ArrayDataset(X, Y), 64, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=5)
    with pytest.raises(NotImplementedError, match="schedule"):
        tr.train(10, 0.0, "lbfgs",
                 optimisation_schedule=([1.0], [[[0.01, "kernel"]]]),
                 verbose_each=0)

    loaders_mb = [DataLoader(ArrayDataset(X, Y), 16, seed=0),
                  DataLoader(ArrayDataset(X, Y), 16, shuffle=False)]
    tr2 = Trainer(spec, params, loaders_mb, Y_std=np.ones(1), S_test=5)
    with pytest.raises(NotImplementedError, match="full-batch"):
        tr2.train(10, 0.0, "lbfgs", verbose_each=0)
