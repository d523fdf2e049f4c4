"""Large-scale / spatial / time-series regression corpora.

reference: code/dsp/data/regression_datasets.py (Airline 5.9M-row flights,
RainFall pickled partitions), code/dsp/data/rainfall_spatial.py (SIC97 with
geo gridding), code/dsp/data/air_quality_timeseries.py (LAQN pm25 window),
plus YearMSD (code/dsp/data/uci_datasets.py:137-171, fixed 463715/51630
split).

The raw corpora are produced by offline download pipelines (reference:
code/datasets/*/tools) that need network access; this environment has zero
egress, so loaders look under data_assets/ and raise an actionable error
when files are absent.  All split/normalisation logic is implemented here
and exercised on synthetic files by the test suite.
"""

from __future__ import annotations

import os
import pickle

import numpy as np

from .uci import standard_normalize
from .splits import k_fold, random_split_prop, random_split_validation

_ROOT = os.environ.get(
    "TGP_DATA_ROOT",
    os.path.join(os.path.dirname(__file__), "..", "..", "..", "data_assets"),
)

AIRLINE_N_TR = 2058097 - 100000  # reference: regression_datasets.py:111


def _require(path, name, hint):
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{name} corpus missing at {path}. {hint} (zero-egress: run the "
            f"dataset tooling offline, see tools/ in the reference)")
    return path


def load_airline(seed: int = 1, use_validation=None, data_dir: str | None = None):
    """2008 airline delays (~5.9M rows -> 2.06M after filtering).

    Fixed split from the committed pickle when present, else the seeded
    permutation generator (reference: regression_datasets.py:125-192).
    """
    d = data_dir or os.path.join(_ROOT, "regression", "airline")
    csv = _require(os.path.join(d, "airline.csv"), "airline",
                   "Produce airline.csv with the dataverse download + awk "
                   "pipeline")
    from . import native
    data = native.read_csv(csv)
    if data is None:
        import pandas as pd
        data = pd.read_csv(csv, header=None).to_numpy(np.float64)

    split_pkl = os.path.join(d, "splits_idx_airline.pkl")
    if os.path.exists(split_pkl):
        with open(split_pkl, "rb") as f:
            split = pickle.load(f)
        tr = split[f"seed_{seed}"]["train"]
        te = split[f"seed_{seed}"]["test"]
    else:
        np.random.seed(seed)
        perm = np.random.permutation(data.shape[0])
        n_tr = min(AIRLINE_N_TR, int(0.95 * data.shape[0]))
        tr, te = perm[:n_tr], perm[n_tr:]

    X_tr, Y_tr = data[tr, :-1], data[tr, -1:]
    X_te, Y_te = data[te, :-1], data[te, -1:]
    X_va = Y_va = None
    if use_validation is not None:
        # shared helper, not perm[:-n_val]: that form empties the training
        # set when n_val == 0
        val_seed, n_val = use_validation
        X_tr, Y_tr, X_va, Y_va = random_split_validation(
            X_tr, Y_tr, val_seed, n_val)
    return standard_normalize(X_tr, Y_tr, X_va, Y_va, X_te, Y_te)


def load_year(seed: int = 1, use_validation=None, data_dir: str | None = None,
              n_train: int = 463715):
    """YearPredictionMSD with its prescribed 463715/51630 split
    (reference: uci_datasets.py:137-171; target is the FIRST column).
    `n_train` exists only so small synthetic files can exercise the loader."""
    d = data_dir or os.path.join(_ROOT, "regression", "uci")
    path = _require(os.path.join(d, "YearPredictionMSD.txt"), "year",
                    "Download YearPredictionMSD.txt.zip from the UCI archive")
    from . import native
    data = native.read_csv(path)
    if data is None:
        import pandas as pd
        data = pd.read_csv(path, header=None).to_numpy(np.float64)
    X, Y = data[:, 1:], data[:, :1]
    n_tr = n_train
    X_tr, Y_tr, X_te, Y_te = X[:n_tr], Y[:n_tr], X[n_tr:], Y[n_tr:]
    X_va = Y_va = None
    if use_validation is not None:
        # shared helper, not perm[:-n_val]: that form empties the training
        # set when n_val == 0
        val_seed, n_val = use_validation
        X_tr, Y_tr, X_va, Y_va = random_split_validation(
            X_tr, Y_tr, val_seed, n_val)
    return standard_normalize(X_tr, Y_tr, X_va, Y_va, X_te, Y_te)


def load_rainfall(partition: int = 0, use_validation=None,
                  data_dir: str | None = None):
    """SIC97 rainfall, pickled partitions 0-4 produced by the reference's
    setup tooling (reference: regression_datasets.py:22-92).  Y_std = 1
    (targets unnormalised)."""
    d = data_dir or os.path.join(_ROOT, "regression", "rainfall")
    tr_p = _require(os.path.join(d, f"data_train_{partition}.pickle"),
                    "rainfall", "Run the SIC97 setup tooling")
    te_p = os.path.join(d, f"data_test_{partition}.pickle")
    with open(tr_p, "rb") as f:
        train = pickle.load(f)
    with open(te_p, "rb") as f:
        test = pickle.load(f)["test"]
    X_tr, Y_tr = np.asarray(train["X"]), np.asarray(train["Y"])
    X_te, Y_te = np.asarray(test["X"]), np.asarray(test["Y"])
    X_va = Y_va = None
    if use_validation is not None:
        val_seed, n_val = use_validation
        X_tr, Y_tr, X_va, Y_va = random_split_validation(
            X_tr, Y_tr, val_seed, n_val)
    out = {"X_tr": X_tr, "Y_tr": Y_tr, "X_va": X_va, "Y_va": Y_va,
           "X_te": X_te, "Y_te": Y_te, "Y_std": np.ones(1), "Y_mean": 0.0}
    return out


def load_rainfall_spatial(partition: int = 0, use_validation=None,
                          options: dict | None = None,
                          data_dir: str | None = None):
    """SIC97 rainfall over plain (x, y) coordinates.

    The plain-coordinate variant of the reference's Rainfall_Spatial
    (rainfall_spatial.py:33-110): read sic_full.dat, optionally shuffle with
    a seed, then either a contiguous k-fold (sklearn-KFold semantics) or the
    seeded random split over stations; inputs z-scored on train stats,
    targets left unnormalised (Y_std=1, normalize_y=False as the reference).

    The reference additionally derives polygon-grid prediction locations
    via geopandas (rainfall_spatial.py:113-220) — geopandas is absent from
    this image, and those grid features only feed its `X_all` plotting
    output, not train/test; this loader covers the modeling path.
    """
    import pandas as pd

    options = dict(options or {})
    d = data_dir or os.path.join(_ROOT, "rainfall_spatial")
    path = _require(os.path.join(d, "sic_full.dat"), "rainfall_spatial",
                    "Download SIC97 (sic97data_01/sic_full.dat)")
    df = pd.read_csv(path)
    x = df[["x", "y"]].to_numpy(np.float64)
    y = df["rainfall"].to_numpy(np.float64)[:, None]

    if options.get("shuffle", True):
        np.random.seed(options.get("seed", 0))
        p = np.random.permutation(x.shape[0])
        x, y = x[p], y[p]

    split_type = options.get("split_type", "k_fold")
    if split_type == "k_fold":
        X_tr, Y_tr, X_te, Y_te = k_fold(x, y, partition,
                                        options.get("num_folds", 5))
    elif split_type == "random_split":
        # reference: partition plays the seed role, validation_size rows
        # become the test set (rainfall_spatial.py:96-103)
        X_tr, Y_tr, X_te, Y_te = random_split_validation(
            x, y, partition, options["validation_size"])
    else:
        raise ValueError(f"unknown split_type {split_type!r}")

    out = standard_normalize(X_tr, Y_tr, None, None, X_te, Y_te,
                             normalize_y=False)
    out["Y_std"] = np.ones(1)
    return out


def load_air_quality(partition: int = 0, use_validation=None,
                     options: dict | None = None,
                     data_dir: str | None = None):
    """London air-quality pm25 single-site window (HP5, 2019-03-15 ..
    2019-04-15), k-fold or head/tail split over the non-NaN rows.
    reference: air_quality_timeseries.py:25-104."""
    import pandas as pd

    options = dict(options or {})
    d = data_dir or os.path.join(_ROOT, "air_pollution")
    path = _require(os.path.join(d, "aq_data.csv"), "air_quality",
                    "Run the LAQN download tooling")
    df = pd.read_csv(path)
    df["date"] = pd.to_datetime(df["date"])
    df["epoch"] = df["date"].astype("int64") // 10 ** 9
    df = df[df["site"] == options.get("site", "HP5")]
    df = df[(df["date"] >= options.get("start_date", "2019-03-15"))
            & (df["date"] < options.get("end_date", "2019-04-15"))]
    dfn = df[df[options.get("species", "pm25")].notnull()]
    x = dfn["epoch"].to_numpy(np.float64)[:, None]
    y = dfn[options.get("species", "pm25")].to_numpy(np.float64)[:, None]

    split_type = options.get("split_type", "k_fold")
    if split_type == "k_fold":
        X_tr, Y_tr, X_te, Y_te = k_fold(x, y, partition,
                                        options.get("num_folds", 5))
    elif split_type == "random_split":
        X_tr, Y_tr, X_te, Y_te = random_split_prop(
            x, y, options.get("validation_size", 0.9))
    else:
        raise ValueError(split_type)
    out = standard_normalize(X_tr, Y_tr, None, None, X_te, Y_te,
                             normalize_y=False)
    out["Y_std"] = np.ones(1)
    return out


LARGE_LOADERS = {
    "airline": load_airline,
    "year": load_year,
    "rainfall": load_rainfall,
    "air_quality": load_air_quality,
    "rainfall_spatial": load_rainfall_spatial,
}
