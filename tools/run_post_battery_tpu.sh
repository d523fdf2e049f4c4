#!/bin/sh
# TPU follow-ups once the battery chains drain: Pallas-vs-jnp A/B on the
# vmapped battery workload.
set -x
cd /root/repo
for f in /tmp/batteries_redo.pid /tmp/batteries_id2.pid; do
  if [ -f "$f" ]; then
    while kill -0 "$(cat $f)" 2>/dev/null; do sleep 60; done
  fi
done
timeout 1800 python tools/pallas_battery_ab.py 500 > results_pallas_ab.json 2>/tmp/pallas_ab.err
echo POST_BATTERY_TPU_DONE
