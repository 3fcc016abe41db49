#!/bin/bash
# Round-4 session-4 chain, reprioritized after the stage-1 diagnosis found
# the fused-forward blocker (bf16 tpu.dynamic_rotate) and a fix landed:
# validate the fix and re-measure the 512^2 headline FIRST (VERDICT r3
# item 4's lever), then heal the 3-D rows, then the long training stages.
# Runs after the r4c chain's process exits (killed or done). ONE python at
# a time; every stage timeout-bounded; artifacts copied only on success.
#
# Usage: nohup bash scripts/tpu_battery_r4d.sh > /tmp/r4d_chain.log 2>&1 &
set -x
cd /root/repo

# ---- wait for the r4c chain to release the chip/core -----------------------
if [ -f /tmp/r4c_watch.pid ]; then
  while kill -0 "$(cat /tmp/r4c_watch.pid)" 2>/dev/null; do sleep 20; done
fi
# also wait out any straggler python the kill orphaned (wait only — never
# kill by pattern)
sleep 5
while ps -eo comm= | grep -qx python; do sleep 20; done

# ---- stage A: validate the _rot bf16 fix on Mosaic -------------------------
timeout 1200 python - > /tmp/r4d_a_fusedfwd.log 2>&1 <<'EOF'
import traceback, time
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
    jproj = jax.jit(project)
    out = jproj(p, U, flags, rho)
    jax.block_until_ready(out)
    print("FUSED FORWARD OK on this backend")
    # quick marginal timing of the projection alone (100 vs 400 calls)
    def chain(k):
        @jax.jit
        def run(c):
            def body(carry, _):
                pp, UU = carry
                pn, Un = project(pp, UU, flags, rho)[:2]
                return (pn, Un), None
            return jax.lax.scan(body, c, None, length=k)[0]
        return run
    ra, rb = chain(100), chain(400)
    ca = ra((p, U)); jax.block_until_ready(ca[0])
    t0 = time.perf_counter(); ca = ra((p, U)); jax.block_until_ready(ca[0])
    t1 = time.perf_counter()
    cb = rb((p, U)); jax.block_until_ready(cb[0])
    t2 = time.perf_counter(); cb = rb((p, U)); jax.block_until_ready(cb[0])
    t3 = time.perf_counter()
    print(f"fused projection marginal: {((t3-t2)-(t1-t0))/300*1e6:.1f} us/call")
except Exception:
    traceback.print_exc()
EOF
tail -20 /tmp/r4d_a_fusedfwd.log
# copy only on success — the heredoc swallows failures via print_exc, and
# a failure log must never replace a success artifact (ADVICE r4 low)
grep -q "FUSED FORWARD OK" /tmp/r4d_a_fusedfwd.log && \
  cp -f /tmp/r4d_a_fusedfwd.log docs/results/fused_fwd_diag_r4d.log

# ---- stage B: headline bench, fused forward now in the ladder --------------
timeout 3600 python bench.py > /tmp/r4d_b_bench.log 2>&1
tail -4 /tmp/r4d_b_bench.log

# ---- stage C: bench3d rerun (learned row gated off the OOM tail;
#      MG row healed if a fix landed before this stage runs) ----------------
timeout 2400 python scripts/bench3d.py --modelDir trained_models/PUNet3_32 \
    > /tmp/r4d_c_bench3d.log 2>&1
tail -10 /tmp/r4d_c_bench3d.log
grep -q "Traceback" /tmp/r4d_c_bench3d.log || \
  cp -f /tmp/r4d_c_bench3d.log docs/results/bench3d_r4d_punet3.log

# ---- stage C2: 3-D MG blow-up isolation on the chip ------------------------
# CPU 32^3 closed-loop is stable (this session); TPU 128^3 blows up even
# cold-started. Isolate: (a) single-solve convergence at 128^3 on TPU,
# (b) closed loop at 128^3 WITHOUT pallas advection, (c) closed loop at
# 64^3 (shallower level hierarchy).
timeout 2400 python - > /tmp/r4d_c2_mg3iso.log 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
print("devices:", jax.devices())
from fluidnet_cxx_tpu.ops import multigrid as mg, ops3d
from fluidnet_cxx_tpu.sim import plume_config
from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
from fluidnet_cxx_tpu.sim.step3d import simulate_step3

# (a) manufactured compatible problem at 128^3: per-cycle residual
flags = ops3d.empty_domain3(1, 128, 128, 128)
cont = np.asarray(mg._cont_mask(flags)) > 0
rng = np.random.default_rng(0)
pstar = (rng.standard_normal((1, 128, 128, 128)).astype(np.float32)) * cont
rhs = mg.apply_A3(flags, jnp.asarray(pstar))
p = jnp.zeros_like(rhs)
solve1 = jax.jit(lambda r, p0: mg.solve_mg3(flags, r, n_vcycles=1, p0=p0))
r0 = float(jnp.max(jnp.abs(rhs)))
print(f"(a) 128^3 single-solve: r0={r0:.3e}")
for c in range(6):
    p = solve1(rhs, p)
    r = float(jnp.max(jnp.abs(mg._residual3(flags, rhs, p))))
    print(f"    cycle {c+1}: max|res|={r:.3e} ratio={r/r0:.3e}", flush=True)

# (b)+(c) closed loop: 128^3 XLA-only advection, then 64^3 both ways
for n, use_pallas in ((128, False), (64, True), (64, False)):
    state = create_plume_scene3(n, n, n, density_val=0.1,
                                u_scale=0.6 * n / 64.0)
    cfg = plume_config(dt=0.25, buoyancy_scale=0.5,
                       gravity_vec=(0.0, -1.0, 0.0), max_disp=2,
                       advection_impl="window", use_pallas=use_pallas,
                       sim_method="multigrid", mg_vcycles=2,
                       mg_warm_start=False)
    @jax.jit
    def run10(s):
        return jax.lax.scan(lambda c, _: (simulate_step3(cfg, c), None),
                            s, None, length=10)[0]
    print(f"closed loop {n}^3 use_pallas={use_pallas}")
    s = state
    for k in range(5):
        s = run10(s)
        d = float(jnp.abs(ops3d.velocity_divergence3(s.U, s.flags)).max())
        print(f"    step {(k+1)*10:3d}: max|div|={d:.3e}", flush=True)
        if not (d < 1e6):
            break
EOF
tail -30 /tmp/r4d_c2_mg3iso.log
cp -f /tmp/r4d_c2_mg3iso.log docs/results/mg3_iso_r4.log

# ---- stage D: train the learned coarse-grid correction (skip if the r4c
#      chain already produced the checkpoint) --------------------------------
if [ ! -d trained_models/MGCoarse_128/best ]; then
  timeout 5400 python scripts/train_mg_coarse.py --res 512 --frames 256 \
      --steps 2000 --modelDir trained_models/MGCoarse_128 \
      > /tmp/r4d_d_mgcoarse.log 2>&1
  tail -6 /tmp/r4d_d_mgcoarse.log
  grep -q "step 2000" /tmp/r4d_d_mgcoarse.log && \
    cp -f /tmp/r4d_d_mgcoarse.log docs/results/mg_coarse_train_r4.log
fi

# ---- stage E: qpm truth columns at 512^2 (+ mg_learned row if trained;
#      skip entirely if the r4c chain already wrote the artifact) ------------
if [ -f docs/results/qpm_512_mglearned_r4.json ] || \
   [ -f docs/results/qpm_512_r4.json ]; then
  echo "qpm artifact already present — skipping stage E"
elif [ -d trained_models/MGCoarse_128/best ]; then
  timeout 3600 python scripts/quality_per_ms.py \
      --modelDir trained_models/PUNetD2_128 \
      --res 512 --iters 600 --jacobi 28,100,200 --mg 1,2 --polish 32,64 \
      --mgLearned trained_models/MGCoarse_128 \
      --out docs/results/qpm_512_mglearned_r4.json \
      > /tmp/r4d_e_qpm.log 2>&1
else
  timeout 3600 python scripts/quality_per_ms.py \
      --modelDir trained_models/PUNetD2_128 \
      --res 512 --iters 600 --jacobi 28,100,200 --mg 2 --polish 32,64 \
      --out docs/results/qpm_512_r4.json > /tmp/r4d_e_qpm.log 2>&1
fi
tail -16 /tmp/r4d_e_qpm.log

# ---- stage F: solver-generated multi-scene dataset + e2e training ----------
timeout 14400 python scripts/make_dataset.py --out out/dataset \
    --scenesTr 32 --scenesTe 8 --res 128 > /tmp/r4d_f_makedataset.log 2>&1
tail -3 /tmp/r4d_f_makedataset.log
timeout 3600 python scripts/preprocess_data.py --dataDir out/dataset \
    --dataset plume_mg --out out/dataset_pp --workers 2 \
    > /tmp/r4d_g_preprocess.log 2>&1
tail -3 /tmp/r4d_g_preprocess.log
timeout 7200 python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --maxEpochs 60 \
    > /tmp/r4d_h_train_e2e.log 2>&1
tail -6 /tmp/r4d_h_train_e2e.log
timeout 3600 python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --resume --maxEpochs 80 \
    > /tmp/r4d_i_train_resume.log 2>&1
tail -6 /tmp/r4d_i_train_resume.log
for f in /tmp/r4d_h_train_e2e.log /tmp/r4d_i_train_resume.log; do
  grep -q "Traceback" "$f" || cp -f "$f" docs/results/$(basename "$f" | \
      sed 's/r4d_[a-z]*_//; s/\.log/_r4.log/')
done

touch /tmp/r4d_done
echo "r4d chain complete"
