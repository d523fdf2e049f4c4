#!/bin/sh
# Regenerate the round-2 raw evidence files (results_torch_replica.jsonl,
# results_fp64_m100.log) lost to a container restart; numbers were already
# recorded in PARITY.md/ROUND2.md — this re-produces the raw artifacts.
# Sequential on purpose: the host has one CPU core.
set -x
cd /root/repo

python tools/torch_replica.py --model SVGP --dataset boston --split 1 \
    --num_inducing 5   --epochs 15000 --out results_torch_replica.jsonl
python tools/torch_replica.py --model SVGP --dataset boston --split 1 \
    --num_inducing 100 --epochs 15000 --out results_torch_replica.jsonl
python tools/torch_replica.py --model SVGP --dataset power --split 1 \
    --num_inducing 100 --epochs 15000 --out results_torch_replica.jsonl
python tools/torch_replica.py --model TGP --dataset power --split 1 \
    --num_inducing 100 --epochs 15000 --out results_torch_replica.jsonl
python tools/torch_replica.py --model ID_TGP --dataset boston --split 1 \
    --num_inducing 100 --epochs 15000 --out results_torch_replica.jsonl

for m in SVGP TGP; do
  for d in boston power; do
    echo "== fp64 $m $d M=100 ==" >> results_fp64_m100.log
    python experiments/main.py --model $m --dataset $d \
        --train_test_seed_split 1 --num_inducing 100 \
        --precision fp64 --platform cpu >> results_fp64_m100.log 2>&1
  done
done
echo ALL_EVIDENCE_DONE
