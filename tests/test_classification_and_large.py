"""Classification pipeline + large-corpus loader tests (synthetic files)."""

import os
import pickle

import numpy as np
import jax
import pytest

from tgp.pytorch_tpu.data.batching import ArrayDataset, DataLoader
from tgp.pytorch_tpu.data import uci_classification as ucc
from tgp.pytorch_tpu.data import large as large_mod
from tgp.pytorch_tpu.ops import kernels as K
from tgp.pytorch_tpu.models import tgp as M
from tgp.pytorch_tpu.likelihoods import LikelihoodSpec
from tgp.pytorch_tpu.train import Trainer
from tgp.pytorch_tpu.train.metrics import calibration_measures


def test_bernoulli_classification_end_to_end(rng):
    np.random.seed(0)
    N = 120
    X = np.random.randn(N, 2)
    y = (X[:, 0] + 0.3 * np.random.randn(N) > 0).astype(np.float64).reshape(-1, 1)
    spec = M.TGPSpec(Dy=1, Dx=2, M=8, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("bernoulli", 1, quad_points=20))
    params = M.init_tgp_params(spec, X, X[:8])
    loaders = [DataLoader(ArrayDataset(X, y), N, seed=0),
               DataLoader(ArrayDataset(X, y), N, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=10)
    tr.train(60, 0.05, "adam", verbose_each=0)
    m = tr.compute_metrics()
    assert m["test"]["acc"] > 0.8
    assert "ECE" in m["test"]["calibration"]


def test_categorical_classification_end_to_end(rng):
    np.random.seed(1)
    N, C = 150, 3
    X = np.random.randn(N, 2)
    y = np.argmax(X @ np.random.randn(2, C) + 0.2 * np.random.randn(N, C),
                  axis=1).astype(np.float64).reshape(-1, 1)
    spec = M.TGPSpec(Dy=C, Dx=2, M=8, N=float(N), kernel=K.from_name("scale_rbf"),
                     likelihood=LikelihoodSpec("categorical", C, quad_points=16,
                                               num_classes=C))
    params = M.init_tgp_params(spec, X, X[:8])
    loaders = [DataLoader(ArrayDataset(X, y), N, seed=0),
               DataLoader(ArrayDataset(X, y), N, shuffle=False)]
    tr = Trainer(spec, params, loaders, Y_std=np.ones(1), S_test=10)
    tr.train(60, 0.05, "adam", verbose_each=0)
    m = tr.compute_metrics()
    assert m["test"]["acc"] > 0.7


def test_calibration_measures_perfect_predictor():
    probs = np.array([[0.9, 0.1], [0.2, 0.8], [0.7, 0.3]])
    labels = np.array([0, 1, 0])
    c = calibration_measures(probs, labels)
    assert 0 <= c["ECE"] <= 1 and c["NLL"] > 0


def test_coverage_and_rmse_helpers():
    from tgp.pytorch_tpu.train.metrics import coverage_95, rmse

    rng = np.random.RandomState(0)
    samples = rng.randn(4000, 50)            # predictive samples ~ N(0,1)
    Y = np.zeros(50)
    assert coverage_95(samples, Y) == 1.0    # 0 is inside every 95% interval
    assert coverage_95(samples, Y + 10.0) == 0.0
    # Y_std rescaling matches the reference's un-normalised RMSE
    # (trainers_regression.py:198-201)
    assert np.isclose(rmse(np.ones(5), np.zeros(5), Y_std=2.0), 2.0)


def test_replica_outliers_flags_naval_style_basin():
    from tgp.pytorch_tpu.train.metrics import replica_outliers

    # the measured naval 20-seed shape: healthy cluster + two-run bad basin
    nll = np.array([-7.20, -7.31, -7.05, -6.94, -7.38, -7.25, -5.731,
                    -7.33, -7.00, -7.22, -5.735, -7.15, -7.24, -7.30,
                    -7.18, -7.09, -7.31, -7.12, -7.26, -7.21])
    out = replica_outliers(nll)
    assert list(np.nonzero(out["flags"])[0]) == [6, 10]
    assert (np.abs(out["z"][[6, 10]]) > 5).all()
    # healthy scatter alone raises nothing
    assert not replica_outliers(nll[:6])["flags"].any()
    # degenerate populations never flag: identical replicas (MAD 0) and
    # tiny populations (R < min_population)
    assert not replica_outliers(np.ones(8))["flags"].any()
    assert not replica_outliers([1.0, 2.0, 99.0])["flags"].any()


def test_movement_rss_preprocessing(tmp_path):
    d = tmp_path / "dataset"
    d.mkdir()
    with open(d / "MovementAAL_target.csv", "w") as f:
        f.write("#sequence_ID,class_label\n1,-1\n2,1\n")
    for sid, base in [(1, 0.0), (2, 5.0)]:
        with open(d / f"MovementAAL_RSS_{sid}.csv", "w") as f:
            f.write("#RSS_anchor1,RSS_anchor2\n")
            for t in range(4):
                f.write(f"{base + t},{base - t}\n")
    X, y = ucc.parse_movement_rss(str(d))
    assert X.shape == (2, 2) and set(y) == {0.0, 1.0}
    np.testing.assert_allclose(X[0], [1.5, -1.5])


def test_arem_csv_repair(tmp_path):
    p = tmp_path / "s1.csv"
    with open(p, "w") as f:
        f.write("# Task: bending\n# time, avg_rss12, ...\n")
        f.write("0,1,2,3,4,5,6\n")
        f.write("bad,row\n")        # short row dropped
        f.write("250,2,3,4,5,6,7\n")
    arr = ucc.repair_arem_csv(str(p))
    assert arr.shape == (2, 7)


def test_rainfall_pickled_partitions(tmp_path):
    X = np.random.randn(20, 2)
    Y = np.random.randn(20, 1)
    with open(tmp_path / "data_train_0.pickle", "wb") as f:
        pickle.dump({"X": X[:15], "Y": Y[:15]}, f)
    with open(tmp_path / "data_test_0.pickle", "wb") as f:
        pickle.dump({"test": {"X": X[15:], "Y": Y[15:]}}, f)
    out = large_mod.load_rainfall(0, data_dir=str(tmp_path))
    assert out["X_tr"].shape == (15, 2) and out["X_te"].shape == (5, 2)
    assert out["Y_std"][0] == 1.0


def test_airline_loader_fallback_split(tmp_path):
    rng = np.random.RandomState(0)
    data = np.c_[rng.randn(200, 3), rng.randn(200)]
    np.savetxt(tmp_path / "airline.csv", data, delimiter=",")
    out = large_mod.load_airline(seed=1, data_dir=str(tmp_path))
    assert out["X_tr"].shape[1] == 3
    assert out["X_tr"].shape[0] + out["X_te"].shape[0] == 200
    # z-scored with train stats
    assert abs(out["X_tr"].mean()) < 1e-8


def test_air_quality_kfold(tmp_path):
    import pandas as pd
    dates = pd.date_range("2019-03-16", periods=50, freq="D" if False else "h")
    df = pd.DataFrame({"date": dates, "site": ["HP5"] * 50,
                       "pm25": np.random.rand(50)})
    df.loc[3, "pm25"] = np.nan
    df.to_csv(tmp_path / "aq_data.csv", index=False)
    out = large_mod.load_air_quality(0, options={"split_type": "k_fold",
                                                 "num_folds": 5},
                                     data_dir=str(tmp_path))
    assert out["X_tr"].shape[0] + out["X_te"].shape[0] == 49  # NaN dropped


def test_missing_corpus_raises_actionable_error():
    with pytest.raises(FileNotFoundError, match="zero-egress"):
        ucc.load_banknote(1)


def test_zero_row_validation_split_keeps_training_set():
    """use_validation=(seed, 0) must keep every training row: the old
    perm[:-0] slice EMPTIED the training set (round-5 review finding;
    same fix applied to the airline/year loaders in data/large.py)."""
    full = ucc.load_synthetic_binary(seed=1)
    zero = ucc.load_synthetic_binary(seed=1, use_validation=(0, 0))
    assert zero["X_tr"].shape[0] == full["X_tr"].shape[0]
    assert zero["X_va"].shape[0] == 0
    five = ucc.load_synthetic_binary(seed=1, use_validation=(0, 5))
    assert five["X_va"].shape[0] == 5
    assert five["X_tr"].shape[0] == full["X_tr"].shape[0] - 5
