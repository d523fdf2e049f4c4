#!/bin/bash
# Probe the axon TPU tunnel, then run the r5b VI-refresh queue (see
# tools/r5b_queue.py).  Usage: tools/r5b_run.sh LOGFILE [first last]
cd "$(dirname "$0")/.."
log=$1; shift
: > "$log"
for attempt in $(seq 1 24); do
  echo "[probe $attempt] $(date +%H:%M:%S)" >> "$log"
  timeout 300 python -u -c "
import jax, jax.numpy as jnp
print(jax.devices(), flush=True)
print(float((jnp.ones((256,256)) @ jnp.ones((256,256))).sum()), flush=True)
" >> "$log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "[probe ok] launching r5b queue $(date +%H:%M:%S)" >> "$log"
    exec tools/tpu_run_robust.sh "$log" \
      timeout 21600 python tools/r5b_queue.py "$@"
  fi
  echo "[probe $attempt rc=$rc] cooling off 300s" >> "$log"
  sleep 300
done
echo "[probe] tunnel never recovered" >> "$log"
