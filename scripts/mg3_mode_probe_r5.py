#!/usr/bin/env python3
"""Localize the 3-D MG closed-loop divergence (VERDICT r4 item 3 real fix).

Runs the 64^3 plume closed loop on CPU at hierarchy depth 3 (stable) and 4
(diverging) and, at each probe step, reports WHERE the divergence lives:
  * argmax cell of |div| (z, y, x)
  * energy fraction within 2 cells of a wall vs the interior
  * checkerboard correlation: corr(div, (-1)^(x+y+z) pattern) over the
    top-decile cells — the MacCormack corrector anti-diffuses checkerboard,
    so a high-frequency leftover from the V-cycle would show here
  * energy fraction in the 8-cell-aligned "coarse-grid imprint" bands
    (cells whose x|y|z ≡ 0 or 7 mod 8 — prolongation seams of the 8^3
    level that only exists at depth 4)

Pure diagnosis; CPU-sized. Writes docs/results/mg3_mode_r5_<ts>.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def stats(div, flags):
    d = np.asarray(div)[0]
    fl = np.asarray(flags)[0] == 1
    d = np.where(fl, d, 0.0)
    n = d.shape[0]
    az, ay, ax = np.unravel_index(np.argmax(np.abs(d)), d.shape)
    e = d * d
    tot = e.sum() + 1e-30
    zz, yy, xx = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                             indexing="ij")
    wall = ((zz <= 2) | (zz >= n - 3) | (yy <= 2) | (yy >= n - 3)
            | (xx <= 2) | (xx >= n - 3))
    cb = ((xx + yy + zz) % 2 * 2 - 1).astype(np.float64)
    # checkerboard correlation over the hottest decile
    thr = np.quantile(np.abs(d)[fl], 0.9) if fl.any() else 0.0
    hot = np.abs(d) >= max(thr, 1e-12)
    cbc = float(np.abs((d[hot] * cb[hot]).sum())
                / (np.abs(d[hot]).sum() + 1e-30)) if hot.any() else 0.0
    seam = ((xx % 8 < 1) | (xx % 8 > 6) | (yy % 8 < 1) | (yy % 8 > 6)
            | (zz % 8 < 1) | (zz % 8 > 6))
    return {
        "max": float(np.abs(d).max()),
        "argmax": [int(az), int(ay), int(ax)],
        "wall_frac": float(e[wall].sum() / tot),
        "cb_corr": cbc,
        "seam8_frac": float(e[seam].sum() / tot),
        "seam8_area_frac": float(seam.mean()),
    }


def main():
    from fluidnet_cxx_tpu.ops import multigrid as mg, ops3d
    from fluidnet_cxx_tpu.sim import plume_config
    from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
    from fluidnet_cxx_tpu.sim.step3d import simulate_step3

    out = {}
    for depth in (3, 4):
        state = create_plume_scene3(64, 64, 64, density_val=0.1, u_scale=0.6)
        cfg = plume_config(dt=0.25, buoyancy_scale=0.5,
                           gravity_vec=(0.0, -1.0, 0.0), max_disp=1,
                           advection_impl="window", use_pallas=False,
                           sim_method="multigrid", mg_vcycles=2,
                           mg_warm_start=False, line_trace=False,
                           mg_max_levels3=depth)
        step = jax.jit(lambda s, cfg=cfg: simulate_step3(cfg, s))
        rows = []
        s = state
        for k in range(30):
            s = step(s)
            if (k + 1) % 5 == 0:
                div = ops3d.velocity_divergence3(s.U, s.flags)
                r = {"step": k + 1, **stats(div, s.flags)}
                rows.append(r)
                print(f"depth={depth} step {k+1:3d}: max={r['max']:.3e} "
                      f"argmax={r['argmax']} wall={r['wall_frac']:.2f} "
                      f"cb={r['cb_corr']:.2f} seam8={r['seam8_frac']:.2f}"
                      f"/{r['seam8_area_frac']:.2f}", flush=True)
                if not np.isfinite(r["max"]) or r["max"] > 1e8:
                    break
        out[f"depth{depth}"] = rows

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "docs", "results")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, time.strftime("mg3_mode_r5_%Y%m%d_%H%M%S.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("artifact:", path)


if __name__ == "__main__":
    main()
