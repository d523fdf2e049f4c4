#!/bin/sh
# ID_TGP 10-seed batteries (PE + Bayesian eval), queued after the main
# battery chain (waits for its pid file to exit).
set -x
cd /root/repo
if [ -f /tmp/batteries.pid ]; then
  while kill -0 "$(cat /tmp/batteries.pid)" 2>/dev/null; do sleep 30; done
fi
for d in boston power; do
  timeout 3600 python experiments/battery.py --model ID_TGP --dataset $d \
      --num_inducing 100 --seeds 1-10 --epochs 15000 \
      --out results_battery.jsonl
done
echo ID_BATTERIES_DONE
