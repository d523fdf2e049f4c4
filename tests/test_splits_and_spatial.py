"""Shared split machinery (reference data.py:196-258) + the Rainfall_Spatial
plain-coordinate loader (reference rainfall_spatial.py:33-110) + registry
routing of the partition-style corpora."""

import numpy as np
import pytest

from tgp.pytorch_tpu.data import large as large_mod
from tgp.pytorch_tpu.data import splits as S
from tgp.pytorch_tpu.data.registry import return_dataset


def test_k_fold_matches_sklearn_kfold():
    from sklearn.model_selection import KFold
    for n, k in [(100, 5), (103, 5), (47, 4)]:
        sk = [te for _, te in KFold(n_splits=k, shuffle=False).split(
            np.zeros((n, 1)))]
        for fold in range(k):
            tr, te = S.k_fold_indices(n, fold, k)
            np.testing.assert_array_equal(te, sk[fold])
            np.testing.assert_array_equal(
                tr, np.setdiff1d(np.arange(n), sk[fold]))


def test_k_fold_bad_fold_raises():
    with pytest.raises(ValueError):
        S.k_fold_indices(10, 5, 5)


def test_random_split_validation_matches_legacy_global_seed():
    X = np.arange(40, dtype=float).reshape(20, 2)
    Y = np.arange(20, dtype=float).reshape(20, 1)
    X_tr, Y_tr, X_va, Y_va = S.random_split_validation(X, Y, seed=3, n_val=5)
    np.random.seed(3)
    perm = np.random.permutation(20)
    np.testing.assert_array_equal(X_tr, X[perm[:15]])
    np.testing.assert_array_equal(X_va, X[perm[15:]])


def _write_sic(tmp_path, n=60):
    import pandas as pd
    rng = np.random.RandomState(0)
    df = pd.DataFrame({"id": np.arange(n),
                       "x": rng.uniform(0, 300, n),
                       "y": rng.uniform(0, 200, n),
                       "rainfall": rng.gamma(2.0, 50.0, n)})
    df.to_csv(tmp_path / "sic_full.dat", index=False)


def test_rainfall_spatial_kfold(tmp_path):
    _write_sic(tmp_path)
    folds = []
    for p in range(5):
        out = large_mod.load_rainfall_spatial(
            p, options={"split_type": "k_fold", "num_folds": 5,
                        "shuffle": True, "seed": 0},
            data_dir=str(tmp_path))
        assert out["X_tr"].shape == (48, 2) and out["X_te"].shape == (12, 2)
        # inputs z-scored on train stats, targets untouched (Y_std=1)
        assert abs(out["X_tr"].mean()) < 1e-8
        assert out["Y_tr"].min() > 0       # raw gamma rainfall, unnormalised
        folds.append(out["X_te"])
    # different folds hold out different stations
    assert not np.allclose(folds[0], folds[1])


def test_rainfall_spatial_random_split_and_shuffle_seed(tmp_path):
    _write_sic(tmp_path)
    o1 = large_mod.load_rainfall_spatial(
        1, options={"split_type": "random_split", "validation_size": 10,
                    "shuffle": True, "seed": 0}, data_dir=str(tmp_path))
    o2 = large_mod.load_rainfall_spatial(
        2, options={"split_type": "random_split", "validation_size": 10,
                    "shuffle": True, "seed": 0}, data_dir=str(tmp_path))
    assert o1["X_te"].shape[0] == 10
    assert not np.allclose(o1["X_te"], o2["X_te"])   # partition = seed


def test_registry_routes_partition_corpora(tmp_path, monkeypatch):
    import pandas as pd
    _write_sic(tmp_path)
    monkeypatch.setenv("TGP_DATA_ROOT", str(tmp_path))
    # rainfall_spatial lives under <root>/rainfall_spatial/
    (tmp_path / "rainfall_spatial").mkdir()
    (tmp_path / "sic_full.dat").rename(
        tmp_path / "rainfall_spatial" / "sic_full.dat")
    import importlib
    importlib.reload(large_mod)
    try:
        loaders, dc = return_dataset(
            "rainfall_spatial", batch_size=32, seed=0,
            options={"split_type": "k_fold", "num_folds": 5,
                     "shuffle": True, "seed": 0})
        assert dc["Dx"] == 2 and dc["Dy"] == 1
        X, Y = next(iter(loaders[0]))
        assert X.shape[1] == 2

        dates = pd.date_range("2019-03-16", periods=50, freq="h")
        df = pd.DataFrame({"date": dates, "site": ["HP5"] * 50,
                           "pm25": np.random.rand(50)})
        (tmp_path / "air_pollution").mkdir()
        df.to_csv(tmp_path / "air_pollution" / "aq_data.csv", index=False)
        loaders, dc = return_dataset(
            "air_quality", batch_size=32, seed=0,
            options={"split_type": "k_fold", "num_folds": 5})
        assert dc["Dx"] == 1 and dc["N_tr"] == 40
    finally:
        monkeypatch.undo()
        importlib.reload(large_mod)
