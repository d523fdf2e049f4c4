"""Round-5 measurement queue — ONE process, ONE tunnel attach.

The axon tunnel wedges fresh clients attaching back-to-back (CLAUDE.md), so
instead of 40 separate CLI invocations this driver imports the experiment
entrypoints and calls them in-process, sequentially:

  0.  remat A/B grid                         -> results_remat.jsonl
  1.  full-length generator stability sweep  -> results_full_length.jsonl
  2.  bf16 vs fp32 power M=100 protocol cell -> results_bf16.log (stdout)
  3.  DGP protocol runs                      -> results_dgp.log
  4.  DGP-2 boston 10-seed battery           -> results_battery.jsonl
  5.  WGP log_exp / StepTanhL parity cells   -> results_wgp_logexp.log
  6.  WGP log_exp boston battery             -> results_battery.jsonl
  7.  classification 10-seed batteries       -> results_battery_class.jsonl
  8.  ID_TGP mean-field-VI boston battery    -> results_battery.jsonl
  9.  bf16 short-segment timing              -> results_bf16.log
  10. rand_exp / rand_softplus full-length   -> results_full_length.jsonl
  11. WGP log_exp power fp32                 -> results_wgp_logexp.log
  12. WGP StepTanhL boston fp64              -> results_wgp_logexp.log
  13. bf16 full cell (nan_guard evidence)    -> results_bf16.log
  14. DGP-2 power 10-seed battery            -> results_battery.jsonl
  15. WGP log_exp power 10-seed battery      -> results_battery.jsonl

    tools/tpu_run_robust.sh /tmp/r5_queue.log timeout 14400 \
        python tools/r5_queue.py [--skip 0,1,...] [--only N,M]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "experiments"))
os.chdir(ROOT)

ap = argparse.ArgumentParser()
ap.add_argument("--skip", default="")
ap.add_argument("--only", default="")
ap.add_argument("--epochs", type=int, default=15000)
A = ap.parse_args()
SKIP = {int(v) for v in A.skip.split(",") if v}
ONLY = {int(v) for v in A.only.split(",") if v}
E = A.epochs


def say(msg):
    print(f"=== [{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def job(n, name):
    if ONLY and n not in ONLY:
        return False
    if n in SKIP:
        say(f"job {n} ({name}) skipped")
        return False
    say(f"job {n}: {name}")
    return True


def run_argv(module_main, argv, tee=None):
    """Call a CLI main() in-process with patched argv; never raise."""
    t0 = time.time()
    old_argv, old_stdout = sys.argv, sys.stdout
    f = open(tee, "a") if tee else None
    try:
        sys.argv = argv
        if f:
            class Tee:
                def write(s_, x):
                    old_stdout.write(x)
                    f.write(x)
                def flush(s_):
                    old_stdout.flush()
                    f.flush()
            sys.stdout = Tee()
        module_main()
        say(f"   ok in {time.time() - t0:.0f}s: {' '.join(argv[:8])}")
        return True
    except SystemExit as e:
        say(f"   SystemExit({e.code}) in {time.time() - t0:.0f}s: {argv}")
        return e.code in (0, None)
    except Exception:
        say(f"   FAILED in {time.time() - t0:.0f}s: {argv}")
        traceback.print_exc()
        traceback.print_exc(file=sys.stdout)  # into the tee'd log too
        return False
    finally:
        sys.argv = old_argv
        sys.stdout = old_stdout
        if f:
            f.close()


import jax  # noqa: E402  (attach once, early liveness line for the wrapper)
say(f"devices: {jax.devices()}")

import battery  # noqa: E402
import main as main_mod  # noqa: E402


def run_main(argv, tee):
    return run_argv(lambda: main_mod.run(main_mod.parse_args(argv[1:])),
                    argv, tee)


# ---- 0: remat grid -------------------------------------------------------
if job(0, "remat A/B grid"):
    from benchmarks import remat_bench  # noqa: E402
    run_argv(remat_bench.main,
             ["remat_bench.py", "--out", "results_remat.jsonl"])

# ---- 1: full-length generator sweep --------------------------------------
ARCHS = [
    "SAL:2", "ArcSL:1", "BoxCoxL:1", "InverseBoxCoxL:1", "Affine:1",
    "SAL_BCL:1", "SAL_InvBCL:1", "SAL_AL:1", "BCL_AL:1", "InvBCL_AL:1",
    "StepTanhL:1:3", "StepSAL:1:3", "StepArcSL:1:3",
    "StepBoxCoxL:1:3", "StepInverseBoxCoxL:1:3", "StepAllL:2",
    "rand_affine:1", "rand_arcsinh:1", "rand_inverse_arcsinh:1",
    "rand_sinh_arcsinh:1", "rand_inverse_sinh_arcsinh:1",
    "rand_tukey_right:1", "rand_exp:1", "rand_softplus:1",
    "rand_inverse_boxcox:1",
]
if job(1, "full-length generator sweep"):
    for arch in ARCHS:
        ok = run_argv(battery.main, [
            "battery.py", "--model", "TGP", "--arch", arch,
            "--dataset", "boston", "--num_inducing", "5", "--seeds", "1",
            "--epochs", str(E), "--precision", "fp32",
            "--out", "results_full_length.jsonl"])
        if not ok:
            with open("results_full_length.jsonl", "a") as fh:
                fh.write(json.dumps({
                    "model": "TGP", "dataset": "boston", "M": 5,
                    "arch": arch, "epochs": E, "status": "crashed"}) + "\n")

# ---- 2: bf16 vs fp32 power M=100 -----------------------------------------
if job(2, "bf16 vs fp32 power M=100"):
    for prec in ("bf16", "fp32"):
        run_main(["main.py", "--model", "TGP", "--dataset", "power",
                  "--train_test_seed_split", "1", "--num_inducing", "100",
                  "--precision", prec, "--epochs", str(E),
                  "--verbose_each", "3000"], tee="results_bf16.log")

# ---- 3: DGP protocol + battery -------------------------------------------
if job(3, "DGP protocol runs"):
    for ds in ("boston", "power"):
        for L in ("2", "3"):
            run_main(["main.py", "--model", "DGP", "--layers", L,
                      "--dataset", ds, "--train_test_seed_split", "1",
                      "--num_inducing", "100", "--precision", "fp32",
                      "--epochs", str(E), "--verbose_each", "3000"],
                     tee="results_dgp.log")
    run_main(["main.py", "--model", "DGP", "--layers", "2",
              "--dataset", "protein", "--train_test_seed_split", "1",
              "--num_inducing", "100", "--precision", "fp32",
              "--epochs", str(E), "--verbose_each", "3000"],
             tee="results_dgp.log")
if job(4, "DGP-2 boston 10-seed battery"):
    run_argv(battery.main, [
        "battery.py", "--model", "DGP", "--layers", "2",
        "--dataset", "boston", "--num_inducing", "100", "--seeds", "1-10",
        "--epochs", str(E), "--precision", "fp32",
        "--out", "results_battery.jsonl"])

# ---- 5: WGP parity cells + battery ---------------------------------------
if job(5, "WGP parity cells (fp64)"):
    for ds in ("boston", "power"):
        run_main(["main.py", "--model", "WGP", "--warp_arch", "log_exp",
                  "--dataset", ds, "--train_test_seed_split", "1",
                  "--num_inducing", "100", "--precision", "fp64",
                  "--epochs", str(E), "--verbose_each", "3000"],
                 tee="results_wgp_logexp.log")
    run_main(["main.py", "--model", "WGP", "--warp_arch", "StepTanhL",
              "--warp_terms", "3", "--dataset", "boston",
              "--train_test_seed_split", "1", "--num_inducing", "100",
              "--precision", "fp64", "--epochs", str(E),
              "--verbose_each", "3000"], tee="results_wgp_logexp.log")
if job(6, "WGP log_exp boston battery"):
    run_argv(battery.main, [
        "battery.py", "--model", "WGP", "--warp_arch", "log_exp",
        "--dataset", "boston", "--num_inducing", "100", "--seeds", "1-10",
        "--epochs", str(E), "--precision", "fp32",
        "--out", "results_battery.jsonl"])

# ---- 7: classification batteries -----------------------------------------
if job(7, "classification 10-seed batteries"):
    for ds in ("synthetic_binary", "synthetic_multiclass"):
        for m in ("TGP", "ID_TGP"):
            run_argv(battery.main, [
                "battery.py", "--model", m, "--dataset", ds,
                "--num_inducing", "50", "--seeds", "1-10",
                "--epochs", str(E), "--precision", "fp32",
                "--out", "results_battery_class.jsonl"])

# ---- 8: VI-hypernet boston battery (the last 3-seed round-4 acceptance) --
if job(8, "ID_TGP mean-field-VI boston 10-seed battery"):
    run_argv(battery.main, [
        "battery.py", "--model", "ID_TGP",
        "--nnet_inference", "mean_field_gaussian",
        "--dataset", "boston", "--num_inducing", "100", "--seeds", "1-10",
        "--epochs", str(E), "--precision", "fp32",
        "--out", "results_battery.jsonl"])

# ---- 9: bf16 epoch-time measurement (short segment, dies at ~ep 2000) ----
if job(9, "bf16 power short-segment timing"):
    run_main(["main.py", "--model", "TGP", "--dataset", "power",
              "--train_test_seed_split", "1", "--num_inducing", "100",
              "--precision", "bf16", "--epochs", "1000",
              "--verbose_each", "200"], tee="results_bf16.log")

# ---- 10: parameterless rand archs (post flows_kld fix) --------------------
if job(10, "rand_exp / rand_softplus full-length"):
    for arch in ("rand_exp:1", "rand_softplus:1"):
        run_argv(battery.main, [
            "battery.py", "--model", "TGP", "--arch", arch,
            "--dataset", "boston", "--num_inducing", "5", "--seeds", "1",
            "--epochs", str(E), "--precision", "fp32",
            "--out", "results_full_length.jsonl"])

# ---- 11: WGP log_exp power fp32 (contingency if the fp64 cell timed out)
if job(11, "WGP log_exp power fp32"):
    run_main(["main.py", "--model", "WGP", "--warp_arch", "log_exp",
              "--dataset", "power", "--train_test_seed_split", "1",
              "--num_inducing", "100", "--precision", "fp32",
              "--epochs", str(E), "--verbose_each", "3000"],
             tee="results_wgp_logexp.log")

# ---- 12: WGP StepTanhL boston fp64 (job 5's tail, split out) --------------
if job(12, "WGP StepTanhL boston fp64"):
    run_main(["main.py", "--model", "WGP", "--warp_arch", "StepTanhL",
              "--warp_terms", "3", "--dataset", "boston",
              "--train_test_seed_split", "1", "--num_inducing", "100",
              "--precision", "fp64", "--epochs", str(E),
              "--verbose_each", "3000"], tee="results_wgp_logexp.log")

# ---- 13: bf16 instability evidence (fine-grained verbose, teed nan_guard)
if job(13, "bf16 power M=100 full cell (expected nan_guard abort)"):
    run_main(["main.py", "--model", "TGP", "--dataset", "power",
              "--train_test_seed_split", "1", "--num_inducing", "100",
              "--precision", "bf16", "--epochs", str(E),
              "--verbose_each", "500"], tee="results_bf16.log")

# ---- 14: DGP-2 power 10-seed battery (seed scatter for the depth win) ----
if job(14, "DGP-2 power 10-seed battery"):
    run_argv(battery.main, [
        "battery.py", "--model", "DGP", "--layers", "2",
        "--dataset", "power", "--num_inducing", "100", "--seeds", "1-10",
        "--epochs", str(E), "--precision", "fp32",
        "--out", "results_battery.jsonl"])

# ---- 15: WGP log_exp power 10-seed battery --------------------------------
if job(15, "WGP log_exp power 10-seed battery"):
    run_argv(battery.main, [
        "battery.py", "--model", "WGP", "--warp_arch", "log_exp",
        "--dataset", "power", "--num_inducing", "100", "--seeds", "1-10",
        "--epochs", str(E), "--precision", "fp32",
        "--out", "results_battery.jsonl"])

# ---- 16: deep TGP (--dgp_flow: table flow arch on the DGP output layer) --
if job(16, "DGP-2+flow protocol cells (power, kin8nm)"):
    for ds in ("power", "kin8nm"):
        run_main(["main.py", "--model", "DGP", "--layers", "2",
                  "--dgp_flow", "--dataset", ds,
                  "--train_test_seed_split", "1", "--num_inducing", "100",
                  "--precision", "fp32", "--epochs", str(E),
                  "--verbose_each", "3000"], tee="results_dgp.log")

# ---- 17: DGP-2+flow kin8nm 10-seed battery (the headline at battery std)
if job(17, "DGP-2+flow kin8nm 10-seed battery"):
    run_argv(battery.main, [
        "battery.py", "--model", "DGP", "--layers", "2", "--dgp_flow",
        "--dataset", "kin8nm", "--num_inducing", "100", "--seeds", "1-10",
        "--epochs", str(E), "--precision", "fp32",
        "--out", "results_battery.jsonl"])

say("queue done")
