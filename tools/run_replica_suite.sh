#!/bin/bash
# Sequential torch-reference-replica suite (single-CPU host).
# Produces the measured parity denominator for PARITY.md.
cd "$(dirname "$0")/.."
OUT=results_torch_replica.jsonl
PY=python
set -x
# quick validation cells (boston, README table oracle)
$PY tools/torch_replica.py --model SVGP --dataset boston --split 1 --num_inducing 5   --epochs 15000 --out $OUT
$PY tools/torch_replica.py --model SVGP --dataset boston --split 1 --num_inducing 100 --epochs 15000 --out $OUT
# north-star cells (power M=100)
$PY tools/torch_replica.py --model SVGP   --dataset power --split 1 --num_inducing 100 --epochs 15000 --out $OUT
$PY tools/torch_replica.py --model TGP    --dataset power --split 1 --num_inducing 100 --epochs 15000 --out $OUT
$PY tools/torch_replica.py --model ID_TGP --dataset power --split 1 --num_inducing 100 --epochs 15000 --out $OUT
# ID_TGP boston (PE + BA rows of the README table)
$PY tools/torch_replica.py --model ID_TGP --dataset boston --split 1 --num_inducing 5   --epochs 15000 --out $OUT
$PY tools/torch_replica.py --model ID_TGP --dataset boston --split 1 --num_inducing 100 --epochs 15000 --out $OUT
echo "REPLICA SUITE DONE"
