"""Battery checkpoint/resume: a crashed multi-hour battery must resume
bit-identically (experiments/battery.py --ckpt).

Three subprocess runs of the same 2-seed boston SVGP minibatch cell:
  A: --ckpt_stop_after 1 simulates a crash after the first 10-epoch
     segment (exit 75), leaving a checkpoint on disk;
  A': the identical command line resumes from the checkpoint and
      finishes epochs 10..20;
  B: an uninterrupted run of the same cell (single process, same
     segmentation).
The per-seed ELBO curves and final NLLs of A' and B must match exactly
(train_multiseed's split==uninterrupted carry guarantee, incl. the
PCG64 shuffle-generator states across the crash).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATTERY = os.path.join(REPO, "experiments", "battery.py")


def _run(tmp, tag, extra=(), expect_rc=0):
    out = os.path.join(tmp, f"{tag}.jsonl")
    curves = os.path.join(tmp, f"{tag}.npy")
    cmd = [sys.executable, BATTERY, "--model", "SVGP",
           "--dataset", "boston", "--num_inducing", "5",
           "--seeds", "1-2", "--epochs", "20", "--batch_size", "256",
           "--platform", "cpu", "--ckpt_each", "10",
           "--out", out, "--save_curves", curves, *extra]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                       cwd=REPO)
    assert p.returncode == expect_rc, \
        f"{tag}: rc={p.returncode}\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    return out, curves


def test_battery_ckpt_resume_bit_identical(tmp_path):
    tmp = str(tmp_path)
    ck_a = os.path.join(tmp, "a.pkl")
    ck_b = os.path.join(tmp, "b.pkl")

    # A: crash after segment 1 (10/20 epochs checkpointed)
    _run(tmp, "a_crash", ["--ckpt", ck_a, "--ckpt_stop_after", "1"],
         expect_rc=75)
    assert os.path.exists(ck_a)
    # A': resume and finish
    out_a, cur_a = _run(tmp, "a_resume", ["--ckpt", ck_a])
    # B: uninterrupted
    out_b, cur_b = _run(tmp, "b_straight", ["--ckpt", ck_b])

    a = json.loads(open(out_a).read().strip().splitlines()[-1])
    b = json.loads(open(out_b).read().strip().splitlines()[-1])
    assert a["nll"] == b["nll"] and a["rmse"] == b["rmse"], (a, b)

    ca, cb = np.load(cur_a), np.load(cur_b)
    assert ca.shape == cb.shape == (2, 20)
    np.testing.assert_array_equal(ca, cb)


def test_battery_ckpt_meta_mismatch_refuses(tmp_path):
    tmp = str(tmp_path)
    ck = os.path.join(tmp, "m.pkl")
    _run(tmp, "m_crash", ["--ckpt", ck, "--ckpt_stop_after", "1"],
         expect_rc=75)
    # same checkpoint, different lr: must refuse loudly, not resume
    out = os.path.join(tmp, "m2.jsonl")
    cmd = [sys.executable, BATTERY, "--model", "SVGP",
           "--dataset", "boston", "--num_inducing", "5",
           "--seeds", "1-2", "--epochs", "20", "--batch_size", "256",
           "--platform", "cpu", "--ckpt_each", "10", "--lr", "0.02",
           "--out", out, "--ckpt", ck]
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=600,
                       cwd=REPO)
    assert p.returncode != 0
    assert "different battery config" in (p.stdout + p.stderr)


def test_battery_completed_ckpt_refuses_rerun(tmp_path):
    """Relaunching a battery whose checkpoint already reached the final
    epoch must refuse (exit nonzero) instead of re-running eval and
    appending duplicate rows to the shared --out jsonl."""
    tmp = str(tmp_path)
    ck = os.path.join(tmp, "done.pkl")
    out, _ = _run(tmp, "full", ["--ckpt", ck])
    n_rows = len(open(out).read().strip().splitlines())
    # identical command line via _run (a drifted copy would trip the
    # different-config guard instead of the completed guard); battery
    # refuses with SystemExit(msg) -> rc 1, and appends nothing
    _run(tmp, "full", ["--ckpt", ck], expect_rc=1)
    assert len(open(out).read().strip().splitlines()) == n_rows
