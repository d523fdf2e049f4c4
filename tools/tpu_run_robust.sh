#!/bin/bash
# Robust TPU job wrapper for the axon tunnel (CLAUDE.md gotcha: a fresh
# client attaching right after another detaches can wedge forever in its
# first RPC).  Usage: tpu_run_robust.sh LOGFILE CMD [ARGS...]
# A job whose log stays empty (nothing beyond the xla_bridge warning) for
# 7 minutes is a wedged attach: kill it, cool off 5 min, retry (3x).
log=$1; shift
for attempt in 1 2 3; do
  : > "$log"
  "$@" >> "$log" 2>&1 &
  pid=$!
  waited=0
  while kill -0 $pid 2>/dev/null; do
    sleep 30; waited=$((waited+30))
    lines=$(grep -vc "xla_bridge\|^$" "$log")
    if [ "$lines" -eq 0 ] && [ $waited -ge 420 ]; then
      echo "WEDGED attempt $attempt, killing $pid" >> "$log"
      kill $pid 2>/dev/null; sleep 15; kill -9 $pid 2>/dev/null
      sleep 300
      continue 2
    fi
  done
  wait $pid; rc=$?
  echo "EXIT rc=$rc attempt=$attempt" >> "$log"
  [ $rc -eq 0 ] && exit 0
  # re-read AFTER exit: the in-loop value is up to 30s stale (or unset if
  # the job died in under a second), and a real failure that only prints
  # its traceback at death must surface its rc, not loop as a "wedge"
  lines=$(grep -vc "xla_bridge\|^$\|^EXIT rc=" "$log")
  [ "$lines" -gt 0 ] && exit $rc
done
exit 1
