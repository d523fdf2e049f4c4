"""Validate the plateau-guard rule against a measured stall population.

Input: per-seed ELBO curves (R, T) from `experiments/battery.py
--save_curves` and the matching battery jsonl row (per-seed final NLLs).
Question: does the Trainer.plateau_guard rule — applied CAUSALLY, i.e.
using only the curve up to epoch t — flag the seeds that end
under-converged, and how early?

The rule (train/trainer.py::_check_plateau): at check epoch t, compare
the mean ELBO of the trailing `window` steps against the window before
it; flag when the relative improvement drops below `min_rel_improve`
while t <= max_fraction * T.  This script sweeps min_rel_improve and
reports, per threshold: which seeds get flagged, at what epoch, and the
precision/recall against the under-converged set (final NLL above a
user-visible cut printed with the seed histogram).

Usage:
  python tools/plateau_analysis.py results_naval_curves_a.npy \
      [results_naval_curves_b.npy ...] results_naval20.jsonl \
      [--nll_cut auto] [--window 2000]

Multiple curves files are concatenated along the seed axis and matched,
in order, against the LAST k rows of the jsonl (one battery row per
curves file) — the layout `battery.py --save_curves` produces when a
seed population is split across several launches.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def first_flag_epoch(curve, window, thresh, max_fraction, cadence=250):
    """Causal scan: earliest check epoch where the rule fires, or None."""
    T = len(curve)
    for t in range(2 * window, int(max_fraction * T) + 1, cadence):
        recent = float(np.mean(curve[t - window:t]))
        prev = float(np.mean(curve[t - 2 * window:t - window]))
        rel = (recent - prev) / (abs(prev) + 1e-12)
        if rel < thresh:
            return t, rel
    return None, None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("curves", nargs="+",
                    help="one or more (R_i, T) .npy curve stacks")
    ap.add_argument("jsonl")
    ap.add_argument("--window", type=int, default=2000)
    ap.add_argument("--max_fraction", type=float, default=0.5)
    ap.add_argument("--nll_cut", default="auto",
                    help="'auto' = healthy median + 3*healthy-MAD; or a float")
    ap.add_argument("--thresholds", default="1e-3,3e-4,1e-4,3e-5,1e-5,0")
    args = ap.parse_args()

    stacks = [np.load(p).astype(np.float64) for p in args.curves]  # (R_i, T)
    rows = [json.loads(l) for l in open(args.jsonl)][-len(stacks):]
    assert len(rows) == len(stacks), "need one jsonl row per curves file"
    for s, r in zip(stacks, rows):
        assert s.shape[0] == len(r["nll"]), (s.shape, len(r["nll"]))
    curves = np.concatenate(stacks, axis=0)
    row = {"dataset": rows[0]["dataset"],
           "nll": [v for r in rows for v in r["nll"]],
           "seeds": [s for r in rows for s in r["seeds"]]}
    nll = np.asarray(row["nll"], np.float64)
    seeds = row["seeds"]
    R, T = curves.shape

    med = float(np.median(nll))
    mad = float(np.median(np.abs(nll - med))) + 1e-12
    cut = med + 3 * mad if args.nll_cut == "auto" else float(args.nll_cut)
    stalled = nll > cut
    print(json.dumps({"dataset": row["dataset"], "R": R, "T": T,
                      "nll_median": round(med, 4), "nll_mad": round(mad, 4),
                      "nll_cut": round(cut, 4),
                      "stalled_seeds": [int(s) for s, b in zip(seeds, stalled)
                                        if b],
                      "per_seed_nll": [round(float(v), 3) for v in nll]}))

    for thresh in [float(t) for t in args.thresholds.split(",")]:
        flags = [first_flag_epoch(curves[r], args.window, thresh,
                                  args.max_fraction) for r in range(R)]
        flagged = np.array([f[0] is not None for f in flags])
        tp = int((flagged & stalled).sum())
        fp = int((flagged & ~stalled).sum())
        fn = int((~flagged & stalled).sum())
        prec = tp / max(tp + fp, 1)
        rec = tp / max(tp + fn, 1)
        print(json.dumps({
            "min_rel_improve": thresh,
            "flagged": {int(s): f[0] for s, f in zip(seeds, flags)
                        if f[0] is not None},
            "tp": tp, "fp": fp, "fn": fn,
            "precision": round(prec, 3), "recall": round(rec, 3)}))


if __name__ == "__main__":
    main()
