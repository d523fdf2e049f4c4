#!/bin/sh
# Re-run the battery cells that died on the pre-fix Pallas vmap bug
# (kin8nm/power/wine_white both models, naval SVGP).  Waits for the ID
# battery chain to release the TPU.
set -x
cd /root/repo
if [ -f /tmp/batteries_id.pid ]; then
  while kill -0 "$(cat /tmp/batteries_id.pid)" 2>/dev/null; do sleep 30; done
fi
for spec in "SVGP kin8nm" "TGP kin8nm" "SVGP power" "TGP power" \
            "SVGP wine_white" "TGP wine_white" "SVGP naval" "TGP naval" \
            "SVGP protein"; do
  set -- $spec
  timeout 1800 python experiments/battery.py --model $1 --dataset $2 \
      --num_inducing 100 --seeds 1-10 --epochs 15000 \
      --out results_battery.jsonl
done
echo REDO_BATTERIES_DONE
