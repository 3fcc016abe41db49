#!/usr/bin/env python3
"""3-D MG corner-mode fix probe (follow-up to mg3_mode_probe_r5).

The depth-4 closed loop grows a corner-localized mode at the coarsest
(8^3) level's live corner (fine [6,6,6], x1.3/step — mg3_mode_r5 artifact).
This probe runs the same 64^3 depth-4 loop under candidate fixes to find
which mechanism is responsible:

  base      - unmodified (diverges)
  post8     - post sweeps 4 -> 8 (is it under-smoothed prolongation noise?)
  coarse96  - coarsest solve 32 -> 96 damped sweeps (is the 8^3 solve the
              amplifier?)
  extend4   - _neumann_extend3 with 4 passes (is the cube-corner dead-cell
              fill the injection site?)
  pconst    - piecewise-constant prolongation at the deepest transition
              only (corner-kink-free by construction)

Each variant: 30 steps, report max|div| trend + value at the corner cell.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run(label, depth=4, steps=30, **over):
    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.sim import plume_config
    from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
    from fluidnet_cxx_tpu.sim.step3d import simulate_step3

    state = create_plume_scene3(64, 64, 64, density_val=0.1, u_scale=0.6)
    cfg = plume_config(dt=0.25, buoyancy_scale=0.5,
                       gravity_vec=(0.0, -1.0, 0.0), max_disp=1,
                       advection_impl="window", use_pallas=False,
                       sim_method="multigrid", mg_vcycles=2,
                       mg_warm_start=False, line_trace=False,
                       mg_max_levels3=depth, **over)
    step = jax.jit(lambda s: simulate_step3(cfg, s))
    s = state
    hist = []
    for k in range(steps):
        s = step(s)
        if (k + 1) % 10 == 0:
            d = np.asarray(ops3d.velocity_divergence3(s.U, s.flags))[0]
            hist.append(float(np.abs(d).max()))
            print(f"  {label:10s} step {k+1:3d}: max|div|={hist[-1]:.3e} "
                  f"corner[6,6,6]={abs(d[6,6,6]):.3e}", flush=True)
            if not np.isfinite(hist[-1]) or hist[-1] > 1e8:
                break
    return hist


def main():
    from fluidnet_cxx_tpu.ops import multigrid as mg

    print("=== base (depth 4)")
    run("base")

    print("=== post sweeps 8")
    run("post8", mg_post=8)

    print("=== coarse_iters 96")
    run("coarse96", mg_coarse_iters=96)

    print("=== neumann extend 4 passes")
    orig_ext = mg._neumann_extend3

    def ext4(flags, e):
        live = mg._cont_mask(flags)
        e = e * live
        for _ in range(4):
            num = jnp.zeros_like(e)
            den = jnp.zeros_like(e)
            for s in ((0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0),
                      (-1, 0, 0), (1, 0, 0)):
                num = num + mg.ops3d.nb3(e * live, *s)
                den = den + mg.ops3d.nb3(live, *s)
            fill = num / jnp.maximum(den, 1.0)
            e = jnp.where(live > 0.5, e, fill)
            live = jnp.maximum(live, (den > 0.5).astype(e.dtype))
        return e

    mg._neumann_extend3 = ext4
    run("extend4")
    mg._neumann_extend3 = orig_ext

    print("=== piecewise-constant prolong at the deepest transition")
    orig_pro = mg._prolong3
    orig_lvls = mg._levels3

    def pconst_prolong(e, _depth_marker=[0]):
        # crude: constant prolongation for the SMALLEST grids only
        # (side <= 8 -> this is the 8^3 -> 16^3 transfer)
        if e.shape[1] <= 8:
            b, dc, hc, wc = e.shape
            ee = jnp.repeat(jnp.repeat(jnp.repeat(e, 2, 1), 2, 2), 2, 3)
            return ee
        return orig_pro(e)

    mg._prolong3 = pconst_prolong
    run("pconst")
    mg._prolong3 = orig_pro


if __name__ == "__main__":
    main()
