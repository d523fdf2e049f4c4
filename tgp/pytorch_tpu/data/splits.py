"""Shared split machinery.

reference: code/dsp/data/data.py:196-258 (`general_dataset_class.
random_split_data` / `random_split_validation` / `k_fold`) — the reference
puts these on its dataset base class; here they are free functions shared by
every loader.
"""

from __future__ import annotations

import numpy as np


def k_fold_indices(n: int, fold: int, num_folds: int):
    """Contiguous k-fold split (sklearn KFold(shuffle=False) semantics: the
    first n % k folds get one extra row).  Shuffling, when wanted, happens
    on the data before folding — reference data.py:236-258.

    Returns (train_idx, test_idx).
    """
    if not 0 <= fold < num_folds:
        raise ValueError(f"fold {fold} out of range for {num_folds} folds")
    sizes = np.full(num_folds, n // num_folds, dtype=int)
    sizes[: n % num_folds] += 1
    edges = np.concatenate([[0], np.cumsum(sizes)])
    te = np.arange(edges[fold], edges[fold + 1])
    tr = np.concatenate([np.arange(0, edges[fold]),
                         np.arange(edges[fold + 1], n)])
    return tr, te


def k_fold(X, Y, fold: int, num_folds: int):
    """reference data.py:236-258: split arrays by contiguous fold."""
    assert X.shape[0] == Y.shape[0], "X/Y row mismatch"
    tr, te = k_fold_indices(X.shape[0], fold, num_folds)
    return X[tr], Y[tr], X[te], Y[te]


def random_split_validation(X, Y, seed: int, n_val: int):
    """Seeded permutation, last n_val rows held out
    (reference data.py:216-234 — uses the legacy global np seed)."""
    n = X.shape[0]
    assert n_val <= n, f"n_val {n_val} > rows {n}"
    np.random.seed(seed)
    perm = np.random.permutation(n)
    tr, va = perm[: n - n_val], perm[n - n_val:]
    return X[tr], Y[tr], X[va], Y[va]


def random_split_prop(X, Y, prop: float):
    """Head/tail proportion split (shuffling happened at load time),
    reference data.py:196-214."""
    n_tr = int(X.shape[0] * prop)
    return X[:n_tr], Y[:n_tr], X[n_tr:], Y[n_tr:]
