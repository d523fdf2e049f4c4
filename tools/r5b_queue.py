"""Round-5b TPU measurement queue: refresh the VI-hypernet cells after the
reference-depth fix (HyperNetSpec.layer_dims now builds num_H+1 hidden
layers for mean_field_gaussian, matching BNN_VILR(H, num_H+1, ...),
flow.py:875-877).  The round-4/5 VI numbers were measured at the shallower
depth; this queue re-measures every VI cell at the corrected architecture.

ONE process for all jobs (fresh clients attaching back-to-back wedge the
axon tunnel — CLAUDE.md round-5).  Run under tools/probe_then_queue.sh.

  python tools/r5b_queue.py [first_job last_job]

Jobs:
  1. ID_TGP mean-field-VI boston 10-seed battery (fp32)  -> results_battery.jsonl
  2. ID_TGP VI boston split 1 fp64, train seeds 0/1/2    -> stdout log
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))

FIRST = int(sys.argv[1]) if len(sys.argv) > 1 else 1
LAST = int(sys.argv[2]) if len(sys.argv) > 2 else 99
E = 15000


def say(msg):
    print(f"[r5b {time.strftime('%H:%M:%S')}] {msg}", flush=True)


def job(n, name):
    on = FIRST <= n <= LAST
    say(f"job {n} {'RUN ' if on else 'skip'}: {name}")
    return on


def run_argv(main_fn, argv):
    old = sys.argv
    sys.argv = argv
    try:
        t0 = time.time()
        main_fn()
        say(f"done in {time.time() - t0:.0f}s")
    except SystemExit as e:
        if e.code not in (0, None):
            say(f"EXIT {e.code}")
    except Exception as e:  # keep the queue moving; the log carries the trace
        import traceback
        traceback.print_exc()
        say(f"FAILED: {e}")
    finally:
        sys.argv = old


import jax  # noqa: E402

say(f"devices: {jax.devices()}")

import battery  # noqa: E402
import main as main_mod  # noqa: E402

if job(1, "ID_TGP mean-field-VI boston 10-seed battery (depth-fixed)"):
    run_argv(battery.main, [
        "battery.py", "--model", "ID_TGP",
        "--nnet_inference", "mean_field_gaussian",
        "--dataset", "boston", "--num_inducing", "100", "--seeds", "1-10",
        "--epochs", str(E), "--precision", "fp32",
        "--out", "results_battery.jsonl"])

if job(2, "ID_TGP VI boston fp64 protocol cells, train seeds 0-2"):
    for s in (0, 1, 2):
        argv = ["main.py", "--model", "ID_TGP",
                "--nnet_inference", "mean_field_gaussian",
                "--dataset", "boston", "--train_test_seed_split", "1",
                "--num_inducing", "100", "--precision", "fp64",
                "--epochs", str(E), "--train_seed", str(s),
                "--verbose_each", "5000"]
        run_argv(lambda: main_mod.run(main_mod.parse_args(argv[1:])), argv)

say("queue complete")
