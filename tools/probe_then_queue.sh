#!/bin/bash
# Wait for the axon TPU tunnel to recover (probe a tiny program under
# timeout, cool off between attempts), then run the round-5 measurement
# queue under the robust wrapper.  Usage:
#   tools/probe_then_queue.sh LOGFILE QUEUE_ARGS...
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
    echo "[probe ok] launching queue $(date +%H:%M:%S)" >> "$log"
    exec tools/tpu_run_robust.sh /tmp/r5_queue.log \
      timeout 28800 python tools/r5_queue.py "$@"
  fi
  echo "[probe $attempt rc=$rc] cooling off 300s" >> "$log"
  sleep 300
done
echo "[probe] tunnel never recovered" >> "$log"
exit 1
