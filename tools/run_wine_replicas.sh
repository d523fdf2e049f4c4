#!/bin/bash
# Relaunch of the two chain-arch replica cells killed by the host restart.
cd "$(dirname "$0")/.."
OUT=results_torch_replica.jsonl
set -x
python tools/torch_replica.py --model TGP --dataset wine_red   --split 1 --num_inducing 100 --epochs 15000 --out $OUT
python tools/torch_replica.py --model TGP --dataset wine_white --split 1 --num_inducing 100 --epochs 15000 --out $OUT
echo "WINE REPLICAS DONE"
