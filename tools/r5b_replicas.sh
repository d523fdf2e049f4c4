#!/bin/bash
# Round-5b torch replica denominators (CPU, serialized — one CPU core):
#   ID_TGP mean-field-VI boston M=100 full protocol, 3 torch seeds, at the
#   reference depth (VIMLP now stacks n_hidden+1 hidden layers, matching
#   BNN_VILR(H, num_H+1, ...) — flow.py:875-877).  Refreshes the PARITY
#   "Mean-field-Gaussian VI hypernets" table's replica column.
set -u
cd "$(dirname "$0")/.."
for s in 0 1 2; do
  echo ">>> replica ID_TGP VI boston torch_seed $s" >&2
  timeout 10800 python tools/torch_replica.py --model ID_TGP --dataset boston \
    --num_inducing 100 --inference vi --epochs 15000 --torch_seed "$s" \
    --log_each 5000 --out results_torch_replica.jsonl >&2 \
    || echo "replica seed $s FAILED" >&2
done
echo "replicas done" >&2
