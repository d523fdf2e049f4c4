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
# Step-arch and chain-arch cells (identity-fit init / Box-Cox families)
$PY tools/torch_replica.py --model TGP --dataset boston   --split 1 --num_inducing 100 --epochs 15000 --out $OUT
$PY tools/torch_replica.py --model TGP --dataset concrete --split 1 --num_inducing 100 --epochs 15000 --out $OUT
$PY tools/torch_replica.py --model TGP --dataset kin8nm   --split 1 --num_inducing 100 --epochs 15000 --out $OUT
$PY tools/torch_replica.py --model TGP --dataset wine_white --split 1 --num_inducing 100 --epochs 15000 --out $OUT
# classification training path (synthetic protocol of
# benchmarks/classification_protocol.py)
$PY tools/torch_replica_classification.py --task binary      --epochs 15000 --out $OUT
$PY tools/torch_replica_classification.py --task categorical --epochs 15000 --out $OUT
echo "REPLICA SUITE DONE"
