"""Serving API tests: bucketing, de-normalisation, per-point log-prob."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.flows import generators as G, spec_from_list
from tgp.pytorch_tpu.serve import Predictor


def _model(flow=None):
    rng = np.random.RandomState(0)
    X = rng.randn(50, 3)
    fspec, finits = (spec_from_list(flow) if flow else (M.IDENTITY_SPEC, None))
    lik = "gaussian_flow" if flow else "gaussian"
    spec = M.TGPSpec(Dy=1, Dx=3, M=6, N=50.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec(lik, 1, quad_points=24),
                     flow=fspec)
    params = M.init_tgp_params(spec, X, X[:6], flow_inits=finits)
    return spec, params, X


def test_predictor_moments_and_bands():
    spec, params, X = _model()
    pred = Predictor(spec, params, Y_std=2.0, Y_mean=5.0, buckets=(16, 64))
    out = pred.predict(X[:10], samples=50)
    assert out["mean"].shape == (1, 10)
    assert out["samples"].shape == (1, 50, 10)
    assert np.all(out["lower"] <= out["upper"])
    # de-normalisation: mean should be approximately Y_mean-centered
    assert abs(out["mean"].mean() - 5.0) < 3.0


def test_predictor_bucket_padding_consistent():
    spec, params, X = _model(flow=G.SAL(1))
    pred = Predictor(spec, params, buckets=(16, 64))
    out_small = pred.predict(X[:10], samples=0, quantiles=None)
    out_full = pred.predict(X[:16], samples=0, quantiles=None)
    np.testing.assert_allclose(out_small["mean"][0], out_full["mean"][0][:10],
                               rtol=1e-6)


def test_predictor_log_prob_matches_model():
    spec, params, X = _model()
    rng = np.random.RandomState(1)
    Y = rng.randn(10, 1)
    pred = Predictor(spec, params, Y_std=1.0, buckets=(16,))
    lp = pred.log_prob(X[:10], Y)
    ref = M.test_log_likelihood(spec, params, jnp.asarray(X[:10]),
                                jnp.asarray(Y), jnp.ones(1))
    np.testing.assert_allclose(np.asarray(lp), np.asarray(ref), rtol=1e-6)


def test_predictor_classification_probs():
    rng = np.random.RandomState(0)
    X = rng.randn(30, 2)
    spec = M.TGPSpec(Dy=1, Dx=2, M=5, N=30.0, kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("bernoulli", 1, quad_points=16))
    params = M.init_tgp_params(spec, X, X[:5])
    pred = Predictor(spec, params, buckets=(16,))
    out = pred.predict(X[:9])
    assert out["probs"].shape == (9, 2)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, atol=1e-6)


def test_reduce_false_per_point_logp():
    spec, params, X = _model(flow=G.SAL(1))
    rng = np.random.RandomState(1)
    Y = rng.randn(50, 1)
    full = M.test_log_likelihood(spec, params, jnp.asarray(X), jnp.asarray(Y),
                                 jnp.ones(1))
    per = M.test_log_likelihood(spec, params, jnp.asarray(X), jnp.asarray(Y),
                                jnp.ones(1), reduce=False)
    np.testing.assert_allclose(float(per.sum()), float(full[0]), rtol=1e-8)


def test_predictor_rng_counter_semantics():
    # one-program requests advance the rng via an in-jit fold_in of a call
    # counter: same seed => reproducible sequence; successive calls differ
    spec, params, X = _model(flow=G.SAL(1))
    p1 = Predictor(spec, params, buckets=(16,), seed=7)
    p2 = Predictor(spec, params, buckets=(16,), seed=7)
    a1 = p1.predict(X[:8], samples=20)["samples"]
    a2 = p1.predict(X[:8], samples=20)["samples"]
    b1 = p2.predict(X[:8], samples=20)["samples"]
    np.testing.assert_array_equal(a1, b1)          # same seed, same call idx
    assert not np.array_equal(a1, a2)              # counter advanced


def test_predictor_bands_match_host_quantiles():
    # fused in-jit quantiles == host-side quantiles of the returned samples
    spec, params, X = _model(flow=G.SAL(1))
    pred = Predictor(spec, params, Y_std=2.0, Y_mean=5.0, buckets=(16,))
    out = pred.predict(X[:8], samples=400)
    q = np.quantile(out["samples"], [0.025, 0.975], axis=1)
    np.testing.assert_allclose(out["lower"], q[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out["upper"], q[-1], rtol=1e-5, atol=1e-6)


def test_predictor_bands_only_matches_samples_path():
    # in-jit device quantiles (bands-only request) == host quantiles of the
    # raw-samples path at the same call index (same fold_in rng, same S)
    spec, params, X = _model(flow=G.SAL(1))
    pa = Predictor(spec, params, Y_std=2.0, Y_mean=5.0, buckets=(16,), seed=3)
    pb = Predictor(spec, params, Y_std=2.0, Y_mean=5.0, buckets=(16,), seed=3)
    bands = pa.predict(X[:8], samples=0)              # default quantiles, S=200
    samp = pb.predict(X[:8], samples=200)
    np.testing.assert_allclose(bands["lower"], samp["lower"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(bands["upper"], samp["upper"], rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(bands["mean"], samp["mean"], rtol=1e-6)


def test_predictor_map_matches_sequential_predicts():
    # pipelined map == the same sequence of predict() calls (same counters)
    spec, params, X = _model(flow=G.SAL(1))
    pa = Predictor(spec, params, Y_std=2.0, Y_mean=5.0, buckets=(16,), seed=9)
    pb = Predictor(spec, params, Y_std=2.0, Y_mean=5.0, buckets=(16,), seed=9)
    reqs = [X[:8], X[8:20], X[20:30]]
    outs_map = pa.map(reqs, samples=30)
    outs_seq = [pb.predict(r, samples=30) for r in reqs]
    assert len(outs_map) == 3
    for om, os_ in zip(outs_map, outs_seq):
        for k in om:
            np.testing.assert_allclose(om[k], os_[k], rtol=1e-6)


def test_predictor_quantile_validation_and_empty_request():
    """Unsorted quantile pairs are normalized (lower < upper), >2 quantiles
    and empty requests are refused (round-5 review findings: [0]/[-1] of
    the caller's tuple order silently swapped/dropped bands; a 0-row
    request compiled a fresh batch-0 program and produced NaN bands)."""
    spec, params, X = _model()
    pred = Predictor(spec, params, Y_std=2.0, Y_mean=5.0, buckets=(16, 64))
    # a reversed pair must still give lower <= upper (the old [0]/[-1]
    # indexing of the caller's order returned the 97.5% band as "lower")
    rev = pred.predict(X[:6], samples=64, quantiles=(0.975, 0.025))
    assert (rev["lower"] <= rev["upper"]).all()
    rev_j = pred.predict(X[:6], quantiles=(0.975, 0.025))  # in-jit path
    assert (rev_j["lower"] <= rev_j["upper"]).all()
    with pytest.raises(ValueError):
        pred.predict(X[:6], quantiles=(0.025, 0.5, 0.975))
    with pytest.raises(ValueError):
        pred.predict(X[:0])


def test_predictor_serves_deep_model():
    """A DeepTGPSpec is servable end-to-end: spec serialization round-trips
    it and log_prob's reduce=False dispatch returns per-point densities."""
    from tgp.pytorch_tpu.models import deep as D
    from tgp.pytorch_tpu.models.serialization import spec_to_json, spec_from_json
    rng = np.random.RandomState(0)
    X = rng.randn(40, 3)
    kern = K.from_name("scale_rbf")
    inner = D.layer_spec(3, 3, 4, 40.0, kern)
    outer = M.TGPSpec(Dy=1, Dx=3, M=4, N=40.0, kernel=kern,
                      likelihood=LikelihoodSpec("gaussian", 1))
    dspec = D.DeepTGPSpec(layers=(inner, outer), S_train=2, S_test=4)
    params = D.init_deep_params(dspec, X, X[:4].copy())
    dspec2 = spec_from_json(spec_to_json(dspec))
    pred = Predictor(dspec2, params, Y_std=1.0, Y_mean=0.0, buckets=(16,))
    out = pred.predict(X[:7])
    assert out["mean"].shape == (1, 7)
    assert np.isfinite(out["mean"]).all() and (out["var"] > 0).all()
    Y = rng.randn(7, 1)
    lp = pred.log_prob(X[:7], Y)   # per-request total over the 7 rows
    assert lp.shape == (1,) and np.isfinite(np.asarray(lp)).all()
    # padding exactness (what deep test_log_likelihood's reduce=False
    # dispatch buys): the internal kernel must return per-POINT densities
    # for the full bucket, and the real rows' densities must not depend on
    # the pad rows' contents — same (base, ctr) rng, two pad fillings
    base = pred._rng
    Ys = np.ones(1)
    pad_a = np.concatenate([X[:7], np.zeros((9, 3))], axis=0)
    pad_b = np.concatenate([X[:7], 50.0 + np.zeros((9, 3))], axis=0)
    Yp = np.concatenate([Y, np.zeros((9, 1))], axis=0)
    lpp_a = np.asarray(pred._log_prob(params, pad_a, Yp, 1, Ys,
                                      base, np.uint32(123)))
    lpp_b = np.asarray(pred._log_prob(params, pad_b, Yp, 1, Ys,
                                      base, np.uint32(123)))
    assert lpp_a.shape == (1, 16)        # per-point, NOT reduced
    np.testing.assert_allclose(lpp_a[:, :7], lpp_b[:, :7], rtol=1e-6)
