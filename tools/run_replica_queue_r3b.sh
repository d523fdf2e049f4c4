#!/bin/bash
# Round-3 replica queue (second batch): wait for the in-flight wine_white
# run, then cross-check the remaining grid datasets.
#   energy  — StepTanhL 15x4 (identity-fit init), N=768  (~25 min eager)
#   naval   — SAL_InvBCL 1,                      N=11934 (~2 h eager)
#   protein — full protocol is ~30 h in eager fp64 torch; measure the
#             steps/s over 60 epochs to document the cost instead.
cd "$(dirname "$0")/.."
OUT=results_torch_replica.jsonl
while [ -f /tmp/wine.pid ] && kill -0 $(cat /tmp/wine.pid) 2>/dev/null; do
  sleep 60
done
set -x
python tools/torch_replica.py --model TGP --dataset energy --split 1 \
  --num_inducing 100 --epochs 15000 --out $OUT
python tools/torch_replica.py --model TGP --dataset naval --split 1 \
  --num_inducing 100 --epochs 15000 --out $OUT
timeout 7200 python tools/torch_replica.py --model TGP --dataset protein \
  --split 1 --num_inducing 100 --epochs 60 --log_each 20 \
  --out results_protein_cost.jsonl
echo "REPLICA QUEUE R3B DONE"
