#!/bin/bash
# Background TPU health probe: every 5 min, try jax.devices() in a bounded
# subprocess; append result to /tmp/tpu_probe.log. Exits when TPU responds.
LOG=/tmp/tpu_probe.log
echo "$(date -u +%FT%TZ) probe loop start" >> "$LOG"
while true; do
  timeout 120 python -c "
import os
os.environ['JAX_PLATFORMS']='tpu'
import jax
d = jax.devices()
print('OK', d)
" >> "$LOG" 2>&1
  rc=$?
  echo "$(date -u +%FT%TZ) probe rc=$rc" >> "$LOG"
  if [ $rc -eq 0 ]; then
    echo "$(date -u +%FT%TZ) TPU ALIVE - exiting probe loop" >> "$LOG"
    exit 0
  fi
  sleep 300
done
