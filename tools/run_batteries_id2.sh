#!/bin/sh
# ID_TGP 10-seed batteries for the remaining regression corpora (boston and
# power already ran) — completes the paper's PE/BA table.  Queued after the
# redo chain releases the TPU.
set -x
cd /root/repo
if [ -f /tmp/batteries_redo.pid ]; then
  while kill -0 "$(cat /tmp/batteries_redo.pid)" 2>/dev/null; do sleep 30; done
fi
for d in concrete energy kin8nm naval protein wine_red wine_white; do
  timeout 3600 python experiments/battery.py --model ID_TGP --dataset $d \
      --num_inducing 100 --seeds 1-10 --epochs 15000 \
      --out results_battery.jsonl
done
echo ID2_BATTERIES_DONE
