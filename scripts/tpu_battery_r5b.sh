#!/bin/bash
# Round-5 follow-on TPU battery: waits for the r5 training chain to free
# the chip, then
#   A. projection-v2 timing + polish-sweep quality gate (VERDICT item 2)
#   B. 128^3 closed-loop MG at UNCAPPED depth with the post3=8 fix — the
#      on-chip proof needed to lift mg_max_levels3 (VERDICT item 3)
#   C. bench3d with the fused 3-D PUNet3 forward (VERDICT item 4)
# ONE python at a time; stages bounded; artifacts self-persist or are
# copied on success.
#
# Usage: nohup bash scripts/tpu_battery_r5b.sh > /tmp/r5b_chain.log 2>&1 &
set -x
cd /root/repo

# wait (up to 4 h) for the r5 training chain to finish
for i in $(seq 1 480); do
  [ -f /tmp/r5_done ] && break
  sleep 30
done

# ---- stage A: projection v2 + sweep quality --------------------------------
timeout 3600 python scripts/proj_v2_probe_r5.py > /tmp/r5b_a_projv2.log 2>&1
tail -12 /tmp/r5b_a_projv2.log

# ---- stage B: 128^3 uncapped-depth closed loop with post3=8 ----------------
timeout 2400 python - > /tmp/r5b_b_mg3deep.log 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)
from fluidnet_cxx_tpu.ops import ops3d
from fluidnet_cxx_tpu.sim import plume_config
from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
from fluidnet_cxx_tpu.sim.step3d import simulate_step3

for n in (64, 128):
    state = create_plume_scene3(n, n, n, density_val=0.1,
                                u_scale=0.6 * n / 64.0)
    cfg = plume_config(dt=0.25, buoyancy_scale=0.5,
                       gravity_vec=(0.0, -1.0, 0.0), max_disp=2,
                       advection_impl="window", use_pallas=True,
                       sim_method="multigrid", mg_vcycles=2,
                       mg_warm_start=False, line_trace=False,
                       mg_max_levels3=0)  # uncapped: 5 levels at 128^3
    @jax.jit
    def run10(s):
        return jax.lax.scan(lambda c, _: (simulate_step3(cfg, c), None),
                            s, None, length=10)[0]
    print(f"uncapped closed loop {n}^3 (post3=8)", flush=True)
    s = state
    ok = True
    for k in range(6):
        s = run10(s)
        d = float(jnp.abs(ops3d.velocity_divergence3(s.U, s.flags)).max())
        print(f"    step {(k+1)*10:3d}: max|div|={d:.3e}", flush=True)
        if not (d < 1e3):
            ok = False
            break
    print(f"{n}^3 RESULT: {'CONVERGENT' if ok and d < 1.0 else 'DIVERGES'}",
          flush=True)
EOF
tail -20 /tmp/r5b_b_mg3deep.log
grep -q "Traceback" /tmp/r5b_b_mg3deep.log || \
  cp -f /tmp/r5b_b_mg3deep.log docs/results/mg3_deep_r5.log

# ---- stage C: bench3d with the fused 3-D forward ---------------------------
timeout 3000 python scripts/bench3d.py --modelDir trained_models/PUNet3_32 \
    > /tmp/r5b_c_bench3d.log 2>&1
tail -10 /tmp/r5b_c_bench3d.log

touch /tmp/r5b_done
echo "r5b chain complete"
