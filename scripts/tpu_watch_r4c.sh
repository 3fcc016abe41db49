#!/bin/bash
# Session-4 watcher: wait for a real axon chip grant (port can be half-open
# with grants starving — observed 2026-08-18 06:42 and 2026-08-19 morning),
# then run the r4c chain (scripts/tpu_battery_r4c.sh). Zero-CPU port probes;
# a bounded python grant check only once the port answers.
#
# Usage: nohup bash scripts/tpu_watch_r4c.sh > /tmp/r4c_watch.log 2>&1 &
set -x
cd /root/repo

GRANTED=0
for outer in $(seq 1 60); do
  for i in $(seq 1 660); do
    if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
      echo "claim port open (outer $outer probe $i)"; break
    fi
    sleep 60
  done
  for i in $(seq 1 4); do
    timeout 420 python -c "import jax; print(jax.devices()); import jax.numpy as j; print(float(j.ones((128,128)).sum()))" \
        > /tmp/r4c_grant.log 2>&1 && break
    echo "no grant yet (outer $outer attempt $i)"; sleep 45
  done
  if grep -qi "tpu" /tmp/r4c_grant.log && grep -q "16384" /tmp/r4c_grant.log; then
    GRANTED=1; break
  fi
  echo "port open but no usable grant — back to waiting"; sleep 300
done
[ "$GRANTED" = 1 ] || { echo "NO TPU GRANT — giving up"; exit 1; }
echo "chip granted at $(date -u)"

exec bash scripts/tpu_battery_r4c.sh
