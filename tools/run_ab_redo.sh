#!/bin/sh
echo $$ > /tmp/ab_redo.pid
set -x
cd /root/repo
if [ -f /tmp/batteries_retime.pid ]; then
  while kill -0 "$(cat /tmp/batteries_retime.pid)" 2>/dev/null; do sleep 30; done
fi
timeout 2400 python tools/pallas_battery_ab.py 500 > results_pallas_ab.json \
    2>/tmp/pallas_ab.err
echo AB_REDO_DONE
