"""Evaluation metrics: calibration (ECE/MCE/BRIER/NLL), coverage, RMSE.

The reference delegates classification calibration to the external
`pytorchlib.compute_calibration_measures` (used at
code/dsp/models/sparse_MF_SP.py:813-815); re-implemented here natively.
"""

from __future__ import annotations

import numpy as np


def calibration_measures(probs, labels, bins: int = 15):
    """Expected/maximum calibration error + Brier + NLL.

    Args:
      probs: (N, C) predicted probabilities.
      labels: (N,) int labels.
    Returns dict(ECE, MCE, BRIER, NLL_mean).
    """
    probs = np.asarray(probs)
    labels = np.asarray(labels).astype(int)
    N, C = probs.shape
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    acc = (pred == labels).astype(np.float64)

    edges = np.linspace(0.0, 1.0, bins + 1)
    ece, mce = 0.0, 0.0
    for lo, hi in zip(edges[:-1], edges[1:]):
        sel = (conf > lo) & (conf <= hi)
        if not sel.any():
            continue
        gap = abs(acc[sel].mean() - conf[sel].mean())
        ece += sel.mean() * gap
        mce = max(mce, gap)

    onehot = np.eye(C)[labels]
    brier = np.mean(np.sum((probs - onehot) ** 2, axis=1))
    eps = 1e-12
    nll = -np.mean(np.log(np.clip(probs[np.arange(N), labels], eps, 1.0)))
    return {"ECE": ece, "MCE": mce, "BRIER": brier, "NLL": nll}


def coverage_95(samples, Y):
    """Fraction of Y inside the [2.5%, 97.5%] sample quantiles.
    reference: code/dsp/trainers/trainers_regression.py:183-208."""
    q = np.quantile(np.asarray(samples), [0.025, 0.975], axis=0)
    Y = np.asarray(Y)
    return float(np.mean((Y >= q[0]) & (Y <= q[1])))


def rmse(pred_mean, Y, Y_std=1.0):
    return float(np.asarray(Y_std) * np.sqrt(np.mean((np.asarray(pred_mean) - np.asarray(Y)) ** 2)))
