#!/bin/bash
# Round-5 TPU measurement queue — one TPU job at a time (two processes
# contending for the chip serialize badly; CLAUDE.md).  Waits for any PID in
# $2 to exit first (the remat grid), then runs:
#   1. full-length generator stability sweep  -> results_full_length.jsonl
#   2. bf16 vs fp32 power M=100 protocol cell -> results_bf16.log
#   3. DGP protocol runs (boston/power x L2/L3 + protein L2)
#                                             -> results_dgp.log
#   4. DGP-2 boston 10-seed battery           -> results_battery.jsonl
#   5. WGP log_exp parity cells (fp64)        -> results_wgp_logexp.log
#   6. WGP log_exp boston 10-seed battery     -> results_battery.jsonl
#   7. classification 10-seed batteries       -> results_battery_class.jsonl
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r5_queue.log}
WAIT_PID=${2:-}

if [ -n "$WAIT_PID" ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

say() { echo "=== [$(date +%H:%M:%S)] $*" >> "$LOG"; }

say "1/7 full-length generator sweep"
bash tools/run_full_length_sweep.sh results_full_length.jsonl >> "$LOG" 2>&1

say "2/7 bf16 vs fp32 power M=100"
for prec in bf16 fp32; do
  say "  precision=$prec"
  timeout 3000 python experiments/main.py --model TGP --dataset power \
    --train_test_seed_split 1 --num_inducing 100 --precision $prec \
    --verbose_each 3000 >> results_bf16.log 2>&1 \
    || say "  precision=$prec FAILED"
done

say "3/7 DGP protocol runs"
for ds in boston power; do
  for L in 2 3; do
    say "  DGP-$L $ds"
    timeout 3000 python experiments/main.py --model DGP --layers $L \
      --dataset $ds --train_test_seed_split 1 --num_inducing 100 \
      --precision fp32 --verbose_each 3000 >> results_dgp.log 2>&1 \
      || say "  DGP-$L $ds FAILED"
  done
done
say "  DGP-2 protein (minibatch SVI)"
timeout 6000 python experiments/main.py --model DGP --layers 2 \
  --dataset protein --train_test_seed_split 1 --num_inducing 100 \
  --precision fp32 --verbose_each 3000 >> results_dgp.log 2>&1 \
  || say "  DGP-2 protein FAILED"

say "4/7 DGP-2 boston 10-seed battery"
timeout 6000 python experiments/battery.py --model DGP --layers 2 \
  --dataset boston --num_inducing 100 --seeds 1-10 --epochs 15000 \
  --precision fp32 --out results_battery.jsonl >> "$LOG" 2>&1 \
  || say "  DGP battery FAILED"

say "5/7 WGP log_exp parity cells (fp64)"
for ds in boston power; do
  say "  WGP(log_exp) $ds fp64"
  timeout 9000 python experiments/main.py --model WGP --warp_arch log_exp \
    --dataset $ds --train_test_seed_split 1 --num_inducing 100 \
    --precision fp64 --verbose_each 3000 >> results_wgp_logexp.log 2>&1 \
    || say "  WGP $ds FAILED"
done
say "  WGP(StepTanhL) boston fp64"
timeout 9000 python experiments/main.py --model WGP --warp_arch StepTanhL \
  --warp_terms 3 --dataset boston --train_test_seed_split 1 \
  --num_inducing 100 --precision fp64 --verbose_each 3000 \
  >> results_wgp_logexp.log 2>&1 || say "  WGP StepTanhL FAILED"

say "6/7 WGP log_exp boston 10-seed battery (fp32)"
timeout 6000 python experiments/battery.py --model WGP --warp_arch log_exp \
  --dataset boston --num_inducing 100 --seeds 1-10 --epochs 15000 \
  --precision fp32 --out results_battery.jsonl >> "$LOG" 2>&1 \
  || say "  WGP battery FAILED"

say "7/7 classification 10-seed batteries"
for ds in synthetic_binary synthetic_multiclass; do
  for m in TGP ID_TGP; do
    say "  $m $ds"
    timeout 9000 python experiments/battery.py --model $m --dataset $ds \
      --num_inducing 50 --seeds 1-10 --epochs 15000 --precision fp32 \
      --out results_battery_class.jsonl >> "$LOG" 2>&1 \
      || say "  $m $ds FAILED"
  done
done
say "queue done"
