#!/bin/bash
# Round-4 TPU measurement battery (VERDICT r3 item 3): one scripted session
# that proves or retires every round-3 perf lever, in priority order so a
# short tunnel window still yields the top items. Waits (cheaply) for the
# axon claim port, then runs each stage bounded. bench.py / bench3d.py
# persist their JSON into docs/results/ themselves; the qpm stage writes
# there directly. Logs land in /tmp/r4_*.log for debugging.
#
# Usage: nohup bash scripts/tpu_battery_r4.sh > /tmp/r4_battery.log 2>&1 &
set -x
cd /root/repo

# ---- stage W: wait for the tunnel -----------------------------------------
# Probe the loopback claim port with bash TCP (zero CPU) before paying for a
# python/jax startup. The port can half-open (backend init then errors, as on
# 2026-08-18 06:42), so on grant failure fall back to port-waiting instead of
# aborting. Up to ~11 h of patience overall.
GRANTED=0
for outer in $(seq 1 40); do
  for i in $(seq 1 660); do
    if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
      echo "claim port open (outer $outer probe $i)"; break
    fi
    sleep 60
  done
  # Confirm an actual chip grant (the port can be open while grants starve).
  for i in $(seq 1 6); do
    timeout 550 python -c "import jax; print(jax.devices())" \
        > /tmp/r4_grant.log 2>&1 && break
    echo "no grant yet (outer $outer attempt $i)"; sleep 45
  done
  if grep -qi tpu /tmp/r4_grant.log; then GRANTED=1; break; fi
  echo "port open but no grant — back to waiting"; sleep 120
done
[ "$GRANTED" = 1 ] || { echo "NO TPU GRANT — giving up"; exit 1; }

# ---- stage 0: merged-advection Mosaic validation + in-step decision data --
# (SimConfig.fuse_advection default flip requires: Mosaic-validated AND
#  faster on real TPU — CLAUDE.md invariant.)
timeout 1800 python - > /tmp/r4_0_merged.log 2>&1 <<'EOF'
import time
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step
state = create_plume_scene(512, 512, density_val=0.1, u_scale=8.0, rad=0.145)
base = plume_config(jacobi_iter=100, use_pallas=True, line_trace=True)
s2 = jax.jit(lambda s: simulate_step(base.replace(fuse_advection=False), s))(state)
s1 = jax.jit(lambda s: simulate_step(base.replace(fuse_advection=True), s))(state)
jax.block_until_ready(s1.U); jax.block_until_ready(s2.U)
print("step parity: dU", float(jnp.abs(s1.U - s2.U).max()),
      "drho", float(jnp.abs(s1.density - s2.density).max()))
def sps(cfg, n=200):
    step = lambda s: simulate_step(cfg, s)
    def chain(k):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c,_: (step(c), None), s, None, length=k)[0]
        return run
    ra, rb = chain(n), chain(4*n)
    s = ra(state); jax.block_until_ready(s.U)
    t0=time.perf_counter(); s=ra(s); jax.block_until_ready(s.U); ta=time.perf_counter()-t0
    sx=rb(s); jax.block_until_ready(sx.U)
    t0=time.perf_counter(); sx=rb(sx); jax.block_until_ready(sx.U); tb=time.perf_counter()-t0
    return 3*n/max(tb-ta,1e-9)
print("512^2 jacobi100 two-kernel:", round(sps(base.replace(fuse_advection=False)),1), "steps/s")
print("512^2 jacobi100 merged    :", round(sps(base.replace(fuse_advection=True)),1), "steps/s")
EOF
tail -4 /tmp/r4_0_merged.log
# Only a log that reached the timing lines is evidence worth committing.
grep -q "merged" /tmp/r4_0_merged.log && \
  cp -f /tmp/r4_0_merged.log docs/results/merged_advection_r4.log

# ---- stage 1: headline bench, default path (fused fwd + tail + trace) -----
timeout 3600 python bench.py > /tmp/r4_1_bench.json 2> /tmp/r4_1_bench.log
tail -3 /tmp/r4_1_bench.log

# ---- stage 2: headline bench with merged advection ------------------------
timeout 3600 env BENCH_FUSE_ADV=1 python bench.py \
    > /tmp/r4_2_bench_fuseadv.json 2> /tmp/r4_2_bench_fuseadv.log
tail -3 /tmp/r4_2_bench_fuseadv.log

# ---- stage 3: 3-D bench with the learned projection (VERDICT item 6) ------
timeout 1800 python scripts/bench3d.py --modelDir trained_models/PUNet3_32 \
    > /tmp/r4_3_bench3d.log 2>&1
tail -8 /tmp/r4_3_bench3d.log
grep -q "Traceback" /tmp/r4_3_bench3d.log || \
  cp -f /tmp/r4_3_bench3d.log docs/results/bench3d_r4_punet3.log

# ---- stage 4: quality-per-ms with converged-truth columns at 512^2 --------
timeout 3600 python scripts/quality_per_ms.py \
    --modelDir trained_models/PUNetD2_128 \
    --res 512 --iters 600 --jacobi 28,100,200 --mg 2 --polish 32,64 \
    --out docs/results/qpm_512_r4.json > /tmp/r4_4_qpm.log 2>&1
tail -12 /tmp/r4_4_qpm.log

# ---- stage 5: 3-D merged advection + fused tail parity at 128^3 -----------
timeout 1800 python - > /tmp/r4_5_fuse3d.log 2>&1 <<'EOF'
import time
import numpy as np, jax, jax.numpy as jnp
from fluidnet_cxx_tpu.sim import plume_config
from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
from fluidnet_cxx_tpu.sim.step3d import simulate_step3
state = create_plume_scene3(128, 128, 128, density_val=0.1, u_scale=1.2)
base = plume_config(dt=0.25, jacobi_iter=60, buoyancy_scale=0.5,
                    gravity_vec=(0.0,-1.0,0.0), advection_impl="window",
                    use_pallas=True, max_disp=2, line_trace=False)
s2 = jax.jit(lambda s: simulate_step3(base.replace(fuse_advection=False), s))(state)
s1 = jax.jit(lambda s: simulate_step3(base.replace(fuse_advection=True), s))(state)
jax.block_until_ready(s1.U)
print("3d step parity: dU", float(jnp.abs(s1.U - s2.U).max()),
      "drho", float(jnp.abs(s1.density - s2.density).max()))
def sps3(cfg, n=20):
    step = lambda s: simulate_step3(cfg, s)
    def chain(k):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c,_: (step(c), None), s, None, length=k)[0]
        return run
    ra, rb = chain(n), chain(2*n)
    s = ra(state); jax.block_until_ready(s.U)
    t0=time.perf_counter(); s=ra(s); jax.block_until_ready(s.U); ta=time.perf_counter()-t0
    sx=rb(s); jax.block_until_ready(sx.U)
    t0=time.perf_counter(); sx=rb(sx); jax.block_until_ready(sx.U); tb=time.perf_counter()-t0
    return n/max(tb-ta,1e-9)
print("128^3 jacobi60 two-kernel:", round(sps3(base.replace(fuse_advection=False)),2), "steps/s")
print("128^3 jacobi60 merged    :", round(sps3(base.replace(fuse_advection=True)),2), "steps/s")
from fluidnet_cxx_tpu.ops import ops3d
from fluidnet_cxx_tpu.ops.pallas.proj_tail3_pallas import project_tail3_pallas
rng = np.random.default_rng(0)
U = jnp.asarray(np.clip(rng.standard_normal((1,3,128,128,128)),-2,2), jnp.float32)
p0 = jnp.asarray(rng.standard_normal((1,128,128,128)), jnp.float32)
p_got, U_got = project_tail3_pallas(state.flags, U, p0, iters=8, damping=6/7)
div = ops3d.velocity_divergence3(U, state.flags)
p_want = ops3d.solve_jacobi_fixed3(state.flags, div, 8, p0=p0, damping=6/7)
U_want = ops3d.set_wall_bcs3(ops3d.velocity_update3(p_want, U, state.flags), state.flags)
print("tail3 parity: dp", float(jnp.abs(p_got-p_want).max()),
      "dU", float(jnp.abs(U_got-U_want).max()))
EOF
tail -5 /tmp/r4_5_fuse3d.log
grep -q "tail3 parity" /tmp/r4_5_fuse3d.log && \
  cp -f /tmp/r4_5_fuse3d.log docs/results/fuse3d_r4.log

# ---- stage 6: displacement envelope probe (BENCH_MAX_DISP tuning) ---------
timeout 1800 python - > /tmp/r4_6_disp.log 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step
from fluidnet_cxx_tpu import ops
state = create_plume_scene(512, 512, density_val=0.1, u_scale=8.0, rad=0.145)
cfg = plume_config(jacobi_iter=100, use_pallas=True, line_trace=True)
@jax.jit
def chunk(s):
    def body(c, _):
        s2 = simulate_step(cfg, c)
        cc = ops.get_centered(s2.U)
        return s2, jnp.max(jnp.abs(cc)) * cfg.dt
    return jax.lax.scan(body, s, None, length=100)
s = state
worst = 0.0
for i in range(12):
    s, d = chunk(s)
    worst = max(worst, float(jnp.max(d)))
    print(f"steps {100*(i+1)}: max dt*|u_c| so far = {worst:.3f}")
print("max displacement", worst, "cells")
EOF
tail -3 /tmp/r4_6_disp.log
grep -q "max displacement" /tmp/r4_6_disp.log && \
  cp -f /tmp/r4_6_disp.log docs/results/disp_probe_r4.log

touch /tmp/r4_battery_done
echo "R4 BATTERY DONE"
