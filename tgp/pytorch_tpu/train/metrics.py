"""Evaluation metrics: calibration (ECE/MCE/BRIER/NLL), coverage, RMSE.

The reference delegates classification calibration to the external
`pytorchlib.compute_calibration_measures` (used at
code/dsp/models/sparse_MF_SP.py:813-815); re-implemented here natively.
"""

from __future__ import annotations

import numpy as np


def calibration_accumulators(probs, labels, bins: int = 15):
    """Summable calibration statistics for a shard of predictions.

    Returns a flat float64 vector [count_b, acc_sum_b, conf_sum_b]*bins +
    [brier_sum, nll_sum, N]: every entry is a SUM over samples, so shards
    (minibatches, processes) compose by vector addition — the multihost
    eval path psums these and finalizes once globally (ECE/MCE need global
    bin means; a per-process ECE would not average correctly)."""
    probs = np.asarray(probs)
    labels = np.asarray(labels).astype(int)
    N, C = probs.shape
    conf = probs.max(axis=1)
    pred = probs.argmax(axis=1)
    acc = (pred == labels).astype(np.float64)

    edges = np.linspace(0.0, 1.0, bins + 1)
    vec = np.zeros(3 * bins + 3)
    for b, (lo, hi) in enumerate(zip(edges[:-1], edges[1:])):
        sel = (conf > lo) & (conf <= hi)
        vec[3 * b] = sel.sum()
        vec[3 * b + 1] = acc[sel].sum()
        vec[3 * b + 2] = conf[sel].sum()
    onehot = np.eye(C)[labels]
    vec[-3] = np.sum((probs - onehot) ** 2)
    eps = 1e-12
    vec[-2] = -np.sum(np.log(np.clip(probs[np.arange(N), labels], eps, 1.0)))
    vec[-1] = N
    return vec


def calibration_from_accumulators(vec, bins: int = 15):
    """Finalize ECE/MCE/BRIER/NLL from (a sum of) accumulator vectors."""
    vec = np.asarray(vec)
    N = vec[-1]
    ece, mce = 0.0, 0.0
    for b in range(bins):
        cnt, acc_s, conf_s = vec[3 * b: 3 * b + 3]
        if cnt == 0:
            continue
        gap = abs(acc_s / cnt - conf_s / cnt)
        ece += (cnt / N) * gap
        mce = max(mce, gap)
    return {"ECE": ece, "MCE": mce, "BRIER": vec[-3] / N,
            "NLL": vec[-2] / N}


def calibration_measures(probs, labels, bins: int = 15):
    """Expected/maximum calibration error + Brier + NLL.

    Args:
      probs: (N, C) predicted probabilities.
      labels: (N,) int labels.
    Returns dict(ECE, MCE, BRIER, NLL_mean).
    """
    return calibration_from_accumulators(
        calibration_accumulators(probs, labels, bins), bins)


def coverage_95(samples, Y):
    """Fraction of Y inside the [2.5%, 97.5%] sample quantiles.
    reference: code/dsp/trainers/trainers_regression.py:183-208."""
    q = np.quantile(np.asarray(samples), [0.025, 0.975], axis=0)
    Y = np.asarray(Y)
    return float(np.mean((Y >= q[0]) & (Y <= q[1])))


def rmse(pred_mean, Y, Y_std=1.0):
    return float(np.asarray(Y_std) * np.sqrt(np.mean((np.asarray(pred_mean) - np.asarray(Y)) ** 2)))


def replica_outliers(values, z_thresh: float = 5.0, min_population: int = 5):
    """Flag cross-replica outliers by robust (median/MAD) z-score.

    The naval SAL_InvBCL study (PARITY.md, 20-seed population) showed the
    warp chain has a discrete bad solution basin that fits TRAIN as well
    as the good one (corr(final-ELBO, NLL) = 0.08) — invisible to any
    training-signal guard, but 11 healthy-MAD away on test NLL.  At
    battery level the cross-replica spread flags it for free; this is
    that cut as a reusable function.

    Args:
      values: (R,) per-replica metric (lower-is-better NLL or any metric —
        the cut is two-sided).
      z_thresh: robust z threshold; 5.0 separates the measured naval
        outliers (|z| ~ 11) from healthy scatter (|z| <= ~2.5) with a
        wide margin.
      min_population: below this many replicas the MAD is too noisy to
        trust; returns no flags.

    Returns dict(flags=bool (R,), z=float (R,), median, mad).  When the
    MAD is exactly 0 (identical replicas) no flags are raised.
    """
    v = np.asarray(values, dtype=np.float64)
    med = float(np.median(v))
    mad = float(np.median(np.abs(v - med)))
    z = np.zeros_like(v) if mad == 0.0 else (v - med) / mad
    flags = (np.abs(z) > z_thresh) & (mad > 0.0) & (v.size >= min_population)
    return {"flags": flags, "z": z, "median": med, "mad": mad}
