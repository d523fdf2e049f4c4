#!/bin/sh
# Fill the last SVGP/TGP table cells (the old redo shell had buffered its
# original list, so the appended cells never ran), then the Pallas A/B.
echo $$ > /tmp/batteries_fill.pid
set -x
cd /root/repo
if [ -f /tmp/batteries_id2.pid ]; then
  while kill -0 "$(cat /tmp/batteries_id2.pid)" 2>/dev/null; do sleep 60; done
fi
for spec in "TGP naval" "SVGP protein" "TGP protein"; do
  set -- $spec
  timeout 5400 python experiments/battery.py --model $1 --dataset $2 \
      --num_inducing 100 --seeds 1-10 --epochs 15000 \
      --out results_battery.jsonl
done
timeout 1800 python tools/pallas_battery_ab.py 500 > results_pallas_ab.json \
    2>/tmp/pallas_ab.err
echo FILL_AND_AB_DONE
