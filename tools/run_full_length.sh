#!/bin/bash
# Full-length (15000-epoch) validation runs for the archs only smoke-tested
# in round 1: StepAllL, the SAL_BCL chain across seeds, and the
# classification protocol at full length.  TPU, sequential (one TPU job at
# a time).
cd "$(dirname "$0")/.."
set -x
python experiments/sweep.py --models TGP --datasets boston --seeds 1 \
    --num_inducing 100 --epochs 15000 --arch StepAllL:2 \
    --out results_full_length.jsonl
python experiments/sweep.py --models TGP --datasets wine_white --seeds 2 3 \
    --num_inducing 100 --epochs 15000 --out results_full_length.jsonl
python benchmarks/classification_protocol.py --epochs 15000 \
    >> results_full_length.jsonl
echo "FULL LENGTH SUITE DONE"
