#!/bin/bash
# Round-4 session-3 TPU chain: runs AFTER the qpm truth-columns job exits
# (PID file /tmp/qpm.pid). Strict sequence — ONE CPU core, one python at a
# time. Every stage timeout-bounded; logs in /tmp/r4c_*.log; artifacts are
# copied into docs/results/ only on success.
#
# Usage: nohup bash scripts/tpu_battery_r4c.sh > /tmp/r4c_chain.log 2>&1 &
set -x
cd /root/repo

# ---- wait for the qpm job to release the chip/core ------------------------
if [ -f /tmp/qpm.pid ]; then
  while kill -0 "$(cat /tmp/qpm.pid)" 2>/dev/null; do sleep 30; done
fi

# ---- stage 1: why does the fused PUNet forward fall back on v5e? ----------
timeout 1200 python - > /tmp/r4c_1_fusedfwd.log 2>&1 <<'EOF'
import traceback
import jax, jax.numpy as jnp
print("devices:", jax.devices())
import dataclasses
from fluidnet_cxx_tpu.models import FluidNet, make_project_fn_fused_forward
from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
from fluidnet_cxx_tpu.train.checkpoint import (load_model_config,
                                               load_train_checkpoint)
mcfg = load_model_config("trained_models/PUNetD2_128")
mcfg = dataclasses.replace(mcfg, polish_impl="fused")
model = FluidNet(mcfg)
ts = init_train_state(model, jax.random.PRNGKey(0), TrainConfig(), 512, 512)
ts, _, _ = load_train_checkpoint("trained_models/PUNetD2_128", ts, best=True)
project = make_project_fn_fused_forward(model, ts.params, 512, 512)
from fluidnet_cxx_tpu.ops.stencils import empty_domain
p = jnp.zeros((1, 512, 512), jnp.float32)
U = jnp.ones((1, 2, 512, 512), jnp.float32)
flags = empty_domain(1, 512, 512)
rho = jnp.zeros((1, 512, 512), jnp.float32)
try:
    out = jax.jit(project)(p, U, flags, rho)
    jax.block_until_ready(out)
    print("FUSED FORWARD OK on this backend")
except Exception:
    traceback.print_exc()
EOF
tail -30 /tmp/r4c_1_fusedfwd.log
cp -f /tmp/r4c_1_fusedfwd.log docs/results/fused_fwd_diag_r4.log

# ---- stage 2: bench3d rerun — learned row now gated off the OOM tail ------
timeout 1800 python scripts/bench3d.py --modelDir trained_models/PUNet3_32 \
    > /tmp/r4c_2_bench3d.log 2>&1
tail -10 /tmp/r4c_2_bench3d.log
grep -q "Traceback" /tmp/r4c_2_bench3d.log || \
  cp -f /tmp/r4c_2_bench3d.log docs/results/bench3d_r4c_punet3.log

# ---- stage 3: 3-D multigrid blow-up probe (warm vs cold, 128^3) -----------
timeout 1800 python - > /tmp/r4c_3_mg3probe.log 2>&1 <<'EOF'
import time
import jax, jax.numpy as jnp
print("devices:", jax.devices())
from fluidnet_cxx_tpu.sim import plume_config
from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
from fluidnet_cxx_tpu.sim.step3d import simulate_step3
from fluidnet_cxx_tpu.ops import ops3d
n = 128
state0 = create_plume_scene3(n, n, n, density_val=0.1, u_scale=0.6 * n / 64.0)
for warm in (True, False):
    cfg = plume_config(dt=0.25, buoyancy_scale=0.5,
                       gravity_vec=(0.0, -1.0, 0.0), max_disp=2,
                       advection_impl="window", use_pallas=True,
                       sim_method="multigrid", mg_vcycles=2,
                       mg_warm_start=warm)
    @jax.jit
    def run10(s):
        return jax.lax.scan(lambda c, _: (simulate_step3(cfg, c), None),
                            s, None, length=10)[0]
    s = state0
    print(f"warm_start={warm}")
    for k in range(8):
        s = run10(s)
        d = float(jnp.abs(ops3d.velocity_divergence3(s.U, s.flags)).max())
        pmax = float(jnp.abs(s.p).max())
        umax = float(jnp.abs(s.U).max())
        print(f"  step {(k+1)*10:3d}: max|div|={d:.3e} max|p|={pmax:.3e} "
              f"max|U|={umax:.3e}", flush=True)
        if not (d < 1e6):
            break
EOF
tail -25 /tmp/r4c_3_mg3probe.log
cp -f /tmp/r4c_3_mg3probe.log docs/results/mg3_probe_r4.log

# ---- stage 4: train the learned coarse-grid correction (VERDICT item 8) ---
timeout 5400 python scripts/train_mg_coarse.py --res 512 --frames 256 \
    --steps 2000 --modelDir trained_models/MGCoarse_128 \
    > /tmp/r4c_4_mgcoarse_train.log 2>&1
tail -6 /tmp/r4c_4_mgcoarse_train.log
grep -q "step 2000" /tmp/r4c_4_mgcoarse_train.log && \
  cp -f /tmp/r4c_4_mgcoarse_train.log docs/results/mg_coarse_train_r4.log

# ---- stage 5: qpm truth columns at 512^2 (+ mg_learned row if trained) ----
# One run covers VERDICT r3 weak #5 (truth-column rerun on TPU) and, when
# stage 4 produced a checkpoint, item 8's mg_learned row in the same table.
if [ -d trained_models/MGCoarse_128/best ]; then
  timeout 3600 python scripts/quality_per_ms.py \
      --modelDir trained_models/PUNetD2_128 \
      --res 512 --iters 600 --jacobi 28,100,200 --mg 1,2 --polish 32,64 \
      --mgLearned trained_models/MGCoarse_128 \
      --out docs/results/qpm_512_mglearned_r4.json \
      > /tmp/r4c_5_qpm_mgl.log 2>&1
  tail -16 /tmp/r4c_5_qpm_mgl.log
else
  echo "no MGCoarse checkpoint — plain qpm truth-columns rerun"
  timeout 3600 python scripts/quality_per_ms.py \
      --modelDir trained_models/PUNetD2_128 \
      --res 512 --iters 600 --jacobi 28,100,200 --mg 2 --polish 32,64 \
      --out docs/results/qpm_512_r4.json > /tmp/r4c_5_qpm.log 2>&1
  tail -14 /tmp/r4c_5_qpm.log
fi

# ---- stage 6: solver-generated multi-scene dataset + e2e training ---------
timeout 14400 python scripts/make_dataset.py --out out/dataset \
    --scenesTr 32 --scenesTe 8 --res 128 > /tmp/r4c_6_makedataset.log 2>&1
tail -3 /tmp/r4c_6_makedataset.log
timeout 3600 python scripts/preprocess_data.py --dataDir out/dataset \
    --dataset plume_mg --out out/dataset_pp --workers 2 \
    > /tmp/r4c_7_preprocess.log 2>&1
tail -3 /tmp/r4c_7_preprocess.log
timeout 7200 python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --maxEpochs 60 \
    > /tmp/r4c_8_train_e2e.log 2>&1
tail -6 /tmp/r4c_8_train_e2e.log
timeout 3600 python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --resume --maxEpochs 80 \
    > /tmp/r4c_9_train_resume.log 2>&1
tail -6 /tmp/r4c_9_train_resume.log
for f in /tmp/r4c_8_train_e2e.log /tmp/r4c_9_train_resume.log; do
  grep -q "Traceback" "$f" || cp -f "$f" docs/results/$(basename "$f" | \
      sed 's/r4c_[0-9]*_//; s/\.log/_r4.log/')
done

touch /tmp/r4c_done
echo "r4c chain complete"
