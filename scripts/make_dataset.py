#!/usr/bin/env python3
"""Generate a multi-scene Mantaflow-layout training dataset with the solver.

Reproduces the reference's dataset SHAPE (ref: pytorch/lib/dataset_load.py:34
— ``dataDir/<dataset>/{tr,te}/NNNNNN/`` scene dirs, 64 saved frames per scene
at every ``save_dt``-th step, each frame a pair ``{t:06d}.bin`` /
``{t:06d}_divergent.bin``) with the solver itself playing Mantaflow's role:
randomized buoyant-plume scenes with random obstacles are rolled out under a
CONVERGED multigrid projection, and at each saved frame both the
pre-projection (divergent) and post-projection states are dumped in the
Manta .bin byte layout (ref: pytorch/lib/load_manta_data.py:4-41).

    python scripts/make_dataset.py --out out/dataset --scenesTr 32 \
        --scenesTe 8 --res 128

Then: fluidnet_cxx_tpu.data.preprocess_manta_scenes (scripts/preprocess_data
.py) -> scripts/train.py --dataDir.
"""
import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_scene(rng, res):
    """Randomized plume scene: inlet speed/radius/density, buoyancy, and
    0-2 disc obstacles clear of the inlet column (mimicking the reference
    dataset's random-geometry scenes)."""
    import jax

    from fluidnet_cxx_tpu.sim import (
        add_cylinder,
        create_plume_scene,
        plume_config,
    )

    u_scale = float(rng.uniform(0.8, 2.5)) * res / 128.0
    rad = float(rng.uniform(0.08, 0.2))
    density_val = float(rng.uniform(0.1, 1.0))
    # Buoyancy is a SimConfig constant, so it bakes into the jitted step:
    # a fresh float per scene would recompile the whole MG-8v scan every
    # scene (~140 s on the 1-core box vs ~35 s of actual sim). Drawing it
    # from a small grid keeps the in-process jit cache hot while inlet
    # speed/radius/density/obstacles stay continuous (they are state, not
    # config). Measured 2026-08-18: 172 s/scene -> ~35 s/scene.
    buoy = float(rng.choice([0.3, 0.6, 0.9, 1.2, 1.5]))
    state = create_plume_scene(
        res, res, density_val=density_val, u_scale=u_scale, rad=rad
    )
    flags = state.flags
    for _ in range(int(rng.integers(0, 3))):
        r = float(rng.uniform(0.04, 0.1)) * res
        cx = float(rng.uniform(0.15 * res, 0.85 * res))
        cy = float(rng.uniform(0.35 * res, 0.85 * res))
        flags = add_cylinder(flags, cx, cy, r)
    state = state._replace(flags=flags)
    # Converged projection for labels AND for the rollout trajectory:
    # 8 V-cycles reach the ~1e-5 residual plateau the reference's own
    # convergence test targets (solver_cpp/test/test_fluid.cpp:438), at a
    # fraction of Jacobi-600's cost.
    cfg = plume_config(
        sim_method="multigrid",
        mg_vcycles=8,
        buoyancy_scale=buoy,
        use_pallas=jax.default_backend() not in ("cpu",),
        line_trace=False,
    )
    return state, cfg


def make_scene_stepper(cfg, save_dt):
    """jit-compiled: advance save_dt steps; also return the LAST step's
    pre-projection (divergent) state. XLA CSEs the shared advection prefix
    between the output_div and full step of the final substep."""
    import jax

    from fluidnet_cxx_tpu.sim import simulate_step

    @jax.jit
    def run(state):
        def body(s, _):
            return simulate_step(cfg, s), None

        state, _ = jax.lax.scan(body, state, None, length=save_dt - 1)
        divergent = simulate_step(cfg, state, output_div=True)
        state = simulate_step(cfg, state)
        return divergent, state

    return run


def dump(path, state):
    from fluidnet_cxx_tpu.data.manta_io import save_manta_file

    save_manta_file(
        path,
        np.asarray(state.p)[0],
        np.asarray(state.U)[0],
        np.asarray(state.flags)[0],
        np.asarray(state.density)[0],
    )


def generate(out_base, prefix, n_scenes, res, n_frames, save_dt, seed0):
    import jax

    for scene_i in range(n_scenes):
        sdir = os.path.join(out_base, prefix, f"{scene_i:06d}")
        os.makedirs(sdir, exist_ok=True)
        done = os.path.join(sdir, "DONE")
        if os.path.exists(done):
            continue
        t0 = time.time()
        rng = np.random.default_rng(seed0 + scene_i)
        state, cfg = build_scene(rng, res)
        run = make_scene_stepper(cfg, save_dt)
        # Frame 0 is the initial state: divergent == projected == initial
        # (the reference's frame 0 is likewise the scene's t=0 dump).
        dump(os.path.join(sdir, "000000.bin"), state)
        dump(os.path.join(sdir, "000000_divergent.bin"), state)
        for f in range(1, n_frames):
            divergent, state = run(state)
            jax.block_until_ready(state.U)
            t = f * save_dt
            dump(os.path.join(sdir, f"{t:06d}.bin"), state)
            dump(os.path.join(sdir, f"{t:06d}_divergent.bin"), divergent)
        rho = np.asarray(state.density)
        assert np.isfinite(rho).all(), f"scene {scene_i} blew up"
        open(done, "w").write("ok\n")
        print(
            f"{prefix}/{scene_i:06d}: {n_frames} frames @ {res}^2 "
            f"({time.time() - t0:.1f}s)",
            flush=True,
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out/dataset")
    ap.add_argument("--dataset", default="plume_mg",
                    help="dataset name (subdir, like the reference's "
                         "dataDir/<dataset>/)")
    ap.add_argument("--scenesTr", type=int, default=32)
    ap.add_argument("--scenesTe", type=int, default=8)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--framesPerScene", type=int, default=64)
    ap.add_argument("--saveDt", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    base = os.path.join(args.out, args.dataset)
    generate(base, "tr", args.scenesTr, args.res, args.framesPerScene,
             args.saveDt, args.seed)
    generate(base, "te", args.scenesTe, args.res, args.framesPerScene,
             args.saveDt, args.seed + 10_000)
    print(f"dataset complete under {base}")


if __name__ == "__main__":
    main()
