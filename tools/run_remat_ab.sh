#!/bin/bash
# remat A/B grid (round-5): peak HBM + steps/s per (M, batch, remat) arm,
# one process per arm (clean per-process HBM peaks), plus the
# max-trainable-batch frontier.  Appends JSON lines to results_remat.jsonl.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-results_remat.jsonl}

run() {
  echo ">>> M=$1 batch=$2 remat=$3 rows=${4:-auto}" >&2
  local rows_arg=()
  [ -n "${4:-}" ] && rows_arg=(--rows "$4")
  timeout 900 python benchmarks/remat_bench.py --M "$1" --batch "$2" \
      --remat "$3" "${rows_arg[@]}" >> "$OUT" 2>>"$OUT.err" \
    || echo "{\"M\": $1, \"batch\": $2, \"remat\": $3, \"status\": \"timeout_or_crash\"}" >> "$OUT"
}

# headline cells: airline M=500 batch 10000; large M=512
for r in 0 1; do
  run 500 10000 $r 200000
  run 512 20000 $r 200000
done

# frontier: max trainable batch at M=500 (rows = 2*batch keeps the
# device-resident dataset proportional; 2 steps/epoch x 5 epochs timed)
for b in 50000 100000 200000 400000 800000; do
  for r in 0 1; do
    run 500 $b $r $((2 * b))
  done
done
echo "remat A/B done -> $OUT" >&2
