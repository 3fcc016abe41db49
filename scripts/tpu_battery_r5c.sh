#!/bin/bash
# Round-5 closing battery: waits for r5b, then
#   A. learned 3-D row with polish 32 (the fused tail3 makes sweeps cheap;
#      32 sweeps should cut PUNet3's max|div| well below Jacobi-60's for
#      ~+1 ms — the quality-per-ms win, VERDICT item 4)
#   B. full headline bench.py (default env) — dress rehearsal for the
#      driver's graded run; confirms the compact JSON line end-to-end.
#
# Usage: nohup bash scripts/tpu_battery_r5c.sh > /tmp/r5c_chain.log 2>&1 &
set -x
cd /root/repo

for i in $(seq 1 480); do
  [ -f /tmp/r5b_done ] && break
  sleep 30
done

timeout 2400 python scripts/bench3d.py --modelDir trained_models/PUNet3_32 \
    --onlyModel --polishSweeps 32 > /tmp/r5c_a_punet3p32.log 2>&1
tail -6 /tmp/r5c_a_punet3p32.log

timeout 5400 python bench.py > /tmp/r5c_b_bench.log 2>&1
tail -3 /tmp/r5c_b_bench.log

touch /tmp/r5c_done
echo "r5c chain complete"
