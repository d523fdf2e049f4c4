#!/bin/bash
# Round-5 torch replica denominators (CPU, serialized — one CPU core):
#   WGP log_exp boston + power M=100 full protocol (the parity arms for
#   experiments/main.py --model WGP --warp_arch log_exp).
set -u
cd "$(dirname "$0")/.."
for ds in boston power; do
  echo ">>> replica WGP log_exp $ds" >&2
  timeout 7200 python tools/torch_replica.py --model WGP --warp_arch log_exp \
    --dataset "$ds" --num_inducing 100 --epochs 15000 --log_each 5000 \
    --out results_torch_replica.jsonl >&2 || echo "replica $ds FAILED" >&2
done
echo "replicas done" >&2
