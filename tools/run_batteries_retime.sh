#!/bin/sh
# Clean re-timing of SVGP cells whose wall-clock was inflated by TPU
# contention (concurrent validation checks); NLL/RMSE were unaffected.
echo $$ > /tmp/batteries_retime.pid
set -x
cd /root/repo
if [ -f /tmp/batteries_fill.pid ]; then
  while kill -0 "$(cat /tmp/batteries_fill.pid)" 2>/dev/null; do sleep 60; done
fi
for spec in "SVGP boston" "SVGP kin8nm" "SVGP wine_red"; do
  set -- $spec
  timeout 1800 python experiments/battery.py --model $1 --dataset $2 \
      --num_inducing 100 --seeds 1-10 --epochs 15000 \
      --out results_battery.jsonl
done
echo RETIME_DONE
