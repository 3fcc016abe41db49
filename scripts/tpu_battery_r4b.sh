#!/bin/bash
# Round-4 follow-up TPU battery: measure the mg_learned hybrid projection
# (VERDICT r3 item 8) once (a) the main battery finished its window and
# (b) the MGCoarse checkpoint exists (CPU-trained by train_mg_coarse.py).
#
# Usage: nohup bash scripts/tpu_battery_r4b.sh > /tmp/r4b_battery.log 2>&1 &
set -x
cd /root/repo

# Wait for the main battery (don't contend for the 1 CPU core / the chip)
# and for the trained coarse model.
for i in $(seq 1 720); do
  [ -f /tmp/r4_battery_done ] && [ -d trained_models/MGCoarse_128/best ] \
    && break
  sleep 60
done
[ -f /tmp/r4_battery_done ] || { echo "main battery never finished"; exit 1; }
[ -d trained_models/MGCoarse_128/best ] || { echo "no MGCoarse ckpt"; exit 1; }

# Re-confirm a chip grant (the window may have closed since the battery ran).
GRANTED=0
for outer in $(seq 1 40); do
  for i in $(seq 1 660); do
    if timeout 5 bash -c 'echo > /dev/tcp/127.0.0.1/8082' 2>/dev/null; then
      echo "claim port open (outer $outer probe $i)"; break
    fi
    sleep 60
  done
  for i in $(seq 1 6); do
    timeout 550 python -c "import jax; print(jax.devices())" \
        > /tmp/r4b_grant.log 2>&1 && break
    echo "no grant yet (outer $outer attempt $i)"; sleep 45
  done
  if grep -qi tpu /tmp/r4b_grant.log; then GRANTED=1; break; fi
  echo "port open but no grant — back to waiting"; sleep 120
done
[ "$GRANTED" = 1 ] || { echo "NO TPU GRANT — giving up"; exit 1; }

# ---- stage A: qpm with the learned-coarse row (quality + ms/projection) ---
timeout 3600 python scripts/quality_per_ms.py \
    --modelDir trained_models/PUNetD2_128 \
    --res 512 --iters 600 --jacobi 100 --mg 1,2 --polish 32 \
    --mgLearned trained_models/MGCoarse_128 \
    --out docs/results/qpm_512_mglearned_r4.json \
    > /tmp/r4b_a_qpm.log 2>&1
tail -12 /tmp/r4b_a_qpm.log

# ---- stage B: in-step steps/s, mg_learned vs multigrid vs flagship-style --
timeout 1800 python - > /tmp/r4b_b_sps.log 2>&1 <<'EOF'
import time
import jax, jax.numpy as jnp
print("devices:", jax.devices())
from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step
from fluidnet_cxx_tpu.models.mg_coarse import (
    load_mg_coarse, make_project_fn_mg_learned)
state = create_plume_scene(512, 512, density_val=0.1, u_scale=8.0, rad=0.145)
model, params = load_mg_coarse("trained_models/MGCoarse_128")
project = make_project_fn_mg_learned(model, params)
def sps(cfg, project_fn=None, n=300):
    step = (lambda s: simulate_step(cfg, s, project_fn=project_fn)) \
        if project_fn is not None else (lambda s: simulate_step(cfg, s))
    def chain(k):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (step(c), None), s, None,
                                length=k)[0]
        return run
    ra, rb = chain(n), chain(4 * n)
    s = ra(state); jax.block_until_ready(s.U)
    t0 = time.perf_counter(); s = ra(s); jax.block_until_ready(s.U)
    ta = time.perf_counter() - t0
    sx = rb(s); jax.block_until_ready(sx.U)
    t0 = time.perf_counter(); sx = rb(sx); jax.block_until_ready(sx.U)
    tb = time.perf_counter() - t0
    return 3 * n / max(tb - ta, 1e-9)
base = plume_config(use_pallas=True, line_trace=True)
print("512^2 mg_learned-1v :", round(sps(
    base.replace(sim_method="convnet"), project_fn=project), 1), "steps/s")
print("512^2 multigrid-2v  :", round(sps(
    base.replace(sim_method="multigrid", mg_vcycles=2)), 1), "steps/s")
print("512^2 multigrid-1v  :", round(sps(
    base.replace(sim_method="multigrid", mg_vcycles=1)), 1), "steps/s")
EOF
tail -6 /tmp/r4b_b_sps.log
grep -q "mg_learned-1v" /tmp/r4b_b_sps.log && \
  cp -f /tmp/r4b_b_sps.log docs/results/mg_learned_sps_r4.log

touch /tmp/r4b_battery_done
echo "R4B BATTERY DONE"
