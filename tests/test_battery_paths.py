"""Round-5 battery extensions: classification (two-phase hold-kernel),
WGP, and DGP cells run end-to-end through the battery CLI (the judge's
round-4 prescription: promote the round-4 paths to battery standard).
Tiny epoch counts — these pin the PLUMBING; the measured 10-seed batteries
live in results_battery.jsonl / PARITY.md."""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pytest

EXP = os.path.join(os.path.dirname(__file__), "..", "experiments")
if EXP not in sys.path:
    sys.path.insert(0, EXP)


def _run_battery(monkeypatch, tmp_path, argv):
    import battery
    out = tmp_path / "out.jsonl"
    monkeypatch.setattr(sys, "argv",
                        ["battery.py"] + argv + ["--out", str(out)])
    battery.main()
    return [json.loads(l) for l in out.read_text().splitlines()]


def test_classification_battery_two_phase(monkeypatch, tmp_path):
    recs = _run_battery(monkeypatch, tmp_path, [
        "--model", "SVGP", "--dataset", "synthetic_binary",
        "--num_inducing", "6", "--seeds", "1-2", "--epochs", "40",
        "--hold_kernel_epochs", "15", "--precision", "fp32"])
    (r,) = recs
    assert r["hold"] == 15 and len(r["nll"]) == 2
    assert np.isfinite(r["nll"]).all() and np.isfinite(r["acc"]).all()
    assert all(0.0 <= a <= 1.0 for a in r["acc"])


def test_id_classification_battery_pe_and_ba(monkeypatch, tmp_path):
    recs = _run_battery(monkeypatch, tmp_path, [
        "--model", "ID_TGP", "--dataset", "synthetic_binary",
        "--num_inducing", "6", "--seeds", "1-2", "--epochs", "30",
        "--hold_kernel_epochs", "10", "--precision", "fp32"])
    tags = [r["model"] for r in recs]
    assert tags == ["ID_TGP(PE)", "ID_TGP(BA)"]
    for r in recs:
        assert np.isfinite(r["nll"]).all()


def test_wgp_battery_log_exp(monkeypatch, tmp_path):
    recs = _run_battery(monkeypatch, tmp_path, [
        "--model", "WGP", "--warp_arch", "log_exp", "--dataset", "boston",
        "--num_inducing", "5", "--seeds", "1-2", "--epochs", "60",
        "--precision", "fp64"])
    (r,) = recs
    assert r["model"] == "WGP(log_exp)"
    assert np.isfinite(r["nll"]).all() and np.isfinite(r["rmse"]).all()


def test_dgp_battery(monkeypatch, tmp_path):
    recs = _run_battery(monkeypatch, tmp_path, [
        "--model", "DGP", "--layers", "2", "--dataset", "boston",
        "--num_inducing", "5", "--seeds", "1-2", "--epochs", "60",
        "--precision", "fp64"])
    (r,) = recs
    assert r["model"] == "DGP-2"
    assert np.isfinite(r["nll"]).all() and np.isfinite(r["rmse"]).all()


def test_regression_model_refused_on_classification(monkeypatch, tmp_path):
    with pytest.raises(SystemExit, match="regression-only"):
        _run_battery(monkeypatch, tmp_path, [
            "--model", "WGP", "--dataset", "synthetic_binary",
            "--num_inducing", "5", "--seeds", "1", "--epochs", "10"])


def test_vi_hypernet_battery(monkeypatch, tmp_path):
    recs = _run_battery(monkeypatch, tmp_path, [
        "--model", "ID_TGP", "--nnet_inference", "mean_field_gaussian",
        "--dataset", "boston", "--num_inducing", "5", "--seeds", "1-2",
        "--epochs", "30", "--precision", "fp32"])
    tags = [r["model"] for r in recs]
    assert tags == ["ID_TGP_VI(PE)", "ID_TGP_VI(BA)"]
    for r in recs:
        assert np.isfinite(r["nll"]).all()


def test_dgp_battery_refuses_solve_levers(monkeypatch, tmp_path):
    # the deep layer specs don't thread fast_solves/solve_precision; running
    # silently at defaults while printing the lever warning would misreport
    # what executed (round-5 review finding)
    with pytest.raises(SystemExit, match="not .*wired"):
        _run_battery(monkeypatch, tmp_path, [
            "--model", "DGP", "--layers", "2", "--dataset", "boston",
            "--num_inducing", "5", "--seeds", "1", "--epochs", "10",
            "--fast_solves"])


def test_dgp_cli_refuses_solve_levers():
    import main as main_mod
    args = main_mod.parse_args([
        "--model", "DGP", "--dataset", "boston",
        "--train_test_seed_split", "1", "--num_inducing", "5",
        "--epochs", "10", "--precision", "fp32", "--solve_precision",
        "high"])
    with pytest.raises(SystemExit, match="not wired"):
        main_mod.run(args)


def test_dgp_flow_cli_smoke_and_step_refusal():
    # deep TGP: --dgp_flow puts the dataset's table flow arch on the DGP
    # output layer.  wine_red's table arch (SAL x3) is non-step -> runs;
    # boston's (StepTanhL) is refused.
    import main as main_mod
    m = main_mod.run(main_mod.parse_args([
        "--model", "DGP", "--layers", "2", "--dgp_flow",
        "--dataset", "wine_red", "--train_test_seed_split", "1",
        "--num_inducing", "5", "--epochs", "30", "--precision", "fp32"]))
    assert np.isfinite(m["test"]["logL"]).all()
    with pytest.raises(SystemExit, match="non-step"):
        main_mod.run(main_mod.parse_args([
            "--model", "DGP", "--layers", "2", "--dgp_flow",
            "--dataset", "boston", "--train_test_seed_split", "1",
            "--num_inducing", "5", "--epochs", "30",
            "--precision", "fp32"]))


def test_dgp_flow_battery(monkeypatch, tmp_path):
    recs = _run_battery(monkeypatch, tmp_path, [
        "--model", "DGP", "--layers", "2", "--dgp_flow",
        "--dataset", "wine_red", "--num_inducing", "5", "--seeds", "1-2",
        "--epochs", "30", "--precision", "fp32"])
    (r,) = recs
    assert r["model"] == "DGP-2+flow"
    assert r["arch"] == "table"
    assert np.isfinite(r["nll"]).all()
