"""Full-loader coverage for the classification corpora + YearMSD, and
smoke/grad coverage for the Step generator archs that had none.

The corpora themselves cannot ship here (zero egress; the reference commits
only split pickles too), so each loader runs end-to-end on synthetic files
shaped exactly like the real ones — the preprocessing helpers were already
unit-tested, these exercise the public load_* entry points (split pickles,
class coding, categorical masks, the use_validation path).
"""

import os
import pickle

import numpy as np
import pytest

from tgp.pytorch_tpu.data import large as large_mod
from tgp.pytorch_tpu.data import uci_classification as ucc
from tgp.pytorch_tpu.flows import generators as G
from tgp.pytorch_tpu.flows.core import (
    flow_forward, init_flow_params, spec_from_list,
)


def _fake_assets(monkeypatch, tmp_path):
    monkeypatch.setattr(ucc, "_asset_path",
                        lambda task, fname: os.path.join(str(tmp_path), fname))


def _split_pickle(tmp_path, name, n, n_tr, seed=1):
    rng = np.random.RandomState(0)
    perm = rng.permutation(n)
    with open(tmp_path / name, "wb") as f:
        pickle.dump({f"seed_{seed}": {"train": perm[:n_tr],
                                      "test": perm[n_tr:]}}, f)


def test_load_banknote_synthetic(tmp_path, monkeypatch):
    _fake_assets(monkeypatch, tmp_path)
    rng = np.random.RandomState(3)
    data = np.c_[rng.randn(30, 4), rng.randint(0, 2, 30).astype(float)]
    np.savetxt(tmp_path / "data_banknote_authentication.txt", data,
               delimiter=",")
    _split_pickle(tmp_path, "splits_idx_data_banknote_authentication.pkl",
                  30, 24)
    out = ucc.load_banknote(1)
    assert out["X_tr"].shape == (24, 4) and out["X_te"].shape == (6, 4)
    np.testing.assert_allclose(out["X_tr"].mean(0), 0, atol=1e-10)
    assert set(np.unique(out["Y_tr"])) <= {0.0, 1.0}  # labels not z-scored
    assert out["Y_std"][0] == 1.0
    # seeded validation carve-out (reference: data.py:216-234)
    out_v = ucc.load_banknote(1, use_validation=(0, 5))
    assert out_v["X_tr"].shape == (19, 4) and out_v["X_va"].shape == (5, 4)


def test_load_heart_categorical_columns_untouched(tmp_path, monkeypatch):
    _fake_assets(monkeypatch, tmp_path)
    rng = np.random.RandomState(4)
    n, d = 40, 12
    X = rng.randn(n, d) * 7 + 3
    for c in ucc.HEART_CATEGORICAL:
        X[:, c] = rng.randint(0, 2, n)
    data = np.c_[X, rng.randint(0, 2, n).astype(float)]
    header = ",".join([f"f{i}" for i in range(d)] + ["DEATH_EVENT"])
    np.savetxt(tmp_path / "heart_failure_clinical_records_dataset.csv", data,
               delimiter=",", header=header, comments="")
    _split_pickle(tmp_path,
                  "splits_idx_heart_failure_clinical_records_dataset.pkl",
                  n, 32)
    out = ucc.load_heart(1)
    cat = list(ucc.HEART_CATEGORICAL)
    cont = [i for i in range(d) if i not in cat]
    assert set(np.unique(out["X_tr"][:, cat])) <= {0.0, 1.0}  # raw
    np.testing.assert_allclose(out["X_tr"][:, cont].mean(0), 0, atol=1e-10)


def test_load_avila_given_split_and_class_coding(tmp_path, monkeypatch):
    _fake_assets(monkeypatch, tmp_path)
    d = tmp_path / "avila"
    d.mkdir()
    classes = list("ABCDEFGHIWXY")
    rng = np.random.RandomState(5)
    for fname, n in [("avila-tr.txt", 24), ("avila-ts.txt", 12)]:
        with open(d / fname, "w") as f:
            for i in range(n):
                feats = ",".join(f"{v:.4f}" for v in rng.randn(10))
                f.write(f"{feats},{classes[i % 12]}\n")
    out = ucc.load_avila()
    assert out["X_tr"].shape == (24, 10) and out["X_te"].shape == (12, 10)
    # labels are the positional code of A..Y (reference keeps the corpus'
    # own train/test files; 12 classes)
    assert set(np.unique(out["Y_tr"])) == set(float(i) for i in range(12))


def test_load_movement_end_to_end(tmp_path, monkeypatch):
    _fake_assets(monkeypatch, tmp_path)
    d = tmp_path / "MovementAAL" / "dataset"
    d.mkdir(parents=True)
    with open(d / "MovementAAL_target.csv", "w") as f:
        f.write("#sequence_ID,class_label\n")
        for sid, lab in [(1, -1), (2, 1), (3, 1), (4, -1)]:
            f.write(f"{sid},{lab}\n")
    rng = np.random.RandomState(6)
    for sid in range(1, 5):
        with open(d / f"MovementAAL_RSS_{sid}.csv", "w") as f:
            f.write("#RSS_anchor1,RSS_anchor2,RSS_anchor3\n")
            for _ in range(5):
                f.write(",".join(f"{v:.3f}" for v in rng.randn(3)) + "\n")
    _split_pickle(tmp_path, "splits_idx_movement.pkl", 4, 3)
    out = ucc.load_movement(1)
    assert out["X_tr"].shape == (3, 3) and out["X_te"].shape == (1, 3)
    assert set(np.unique(np.r_[out["Y_tr"], out["Y_te"]])) <= {0.0, 1.0}


def test_load_activity_seven_classes(tmp_path, monkeypatch):
    _fake_assets(monkeypatch, tmp_path)
    base = tmp_path / "AReM"
    rng = np.random.RandomState(7)
    for cname in ucc.ACTIVITY_CLASSES:
        cd = base / cname
        cd.mkdir(parents=True)
        for s in range(2):
            with open(cd / f"dataset{s}.csv", "w") as f:
                f.write("# Task: whatever\n")
                for t in range(6):
                    vals = ",".join(f"{v:.3f}" for v in rng.randn(6))
                    f.write(f"{t * 250},{vals}\n")
    out = ucc.load_activity(seed=1)
    n = out["X_tr"].shape[0] + out["X_te"].shape[0]
    assert n == 14 and out["X_tr"].shape == (12, 6)  # 90/10 seeded split
    assert set(np.unique(np.r_[out["Y_tr"], out["Y_te"]])) <= set(
        float(i) for i in range(7))


def test_load_year_prescribed_split_first_column_target(tmp_path):
    rng = np.random.RandomState(8)
    data = np.c_[rng.randint(1950, 2011, 100).astype(float), rng.randn(100, 5)]
    np.savetxt(tmp_path / "YearPredictionMSD.txt", data, delimiter=",",
               fmt="%.6f")
    out = large_mod.load_year(data_dir=str(tmp_path), n_train=80)
    assert out["X_tr"].shape == (80, 5) and out["X_te"].shape == (20, 5)
    # target is the FIRST column, z-scored with train stats
    np.testing.assert_allclose(
        out["Y_te"] * out["Y_std"] + data[:80, 0].mean(),
        data[80:, :1], atol=1e-6)


@pytest.mark.parametrize("gen,args", [
    (G.StepArcSL, (2, 3)),
    (G.StepBoxCoxL, (2, 3)),
    (G.StepSAL, (2, 3)),
    (G.StepTanhL, (2, 3)),
])
def test_step_arch_generators_build_and_differentiate(gen, args):
    import jax

    np.random.seed(0)
    spec, inits = spec_from_list(gen(*args))
    params = init_flow_params(spec, inits)
    f = np.linspace(-2.0, 2.0, 64)

    out = np.asarray(flow_forward(spec, params, f))
    assert out.shape == f.shape and np.all(np.isfinite(out))

    g = jax.grad(lambda p: flow_forward(spec, p, f).sum())(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert leaves and all(np.all(np.isfinite(l)) for l in leaves)
