#!/usr/bin/env python3
"""Rayleigh-Taylor instability driver (twin of pytorch/rayleighTaylor.py).

Tracks the interface growth distance and mean-density conservation each
step, appending to ``distance.npy`` / ``avg_density.npy`` like the reference
(ref: rayleighTaylor.py:241-281). The reference driver itself calls
lib.simulate with a stale 5-arg signature and could not run unmodified; this
driver is the working equivalent.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--simConf", default=None)
    ap.add_argument("--outputFolder", default="out/rt")
    ap.add_argument("--restartSim", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="fused Pallas kernels + no line trace (bit-exact "
                         "kernels; the trace is inert without interior "
                         "obstacles)")
    ap.add_argument("--maxIter", type=int, default=None)
    args = ap.parse_args()

    from fluidnet_cxx_tpu.config import sim_config_from_mconf
    from fluidnet_cxx_tpu.sim import create_rayleigh_taylor_scene
    from fluidnet_cxx_tpu.sim.driver import run_simulation
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_sim_restart,
        save_sim_restart,
    )
    from fluidnet_cxx_tpu.utils.diagnostics import (
        mean_density,
        rt_interface_distance,
    )
    from fluidnet_cxx_tpu.utils.plotting import plot_sim_snapshot

    conf = {}
    if args.simConf:
        with open(args.simConf) as f:
            conf = yaml.safe_load(f) or {}
    if args.maxIter is not None:
        conf["maxIter"] = args.maxIter

    res_x = int(conf.get("resX", 128))
    res_y = int(conf.get("resY", 512))
    max_iter = int(conf.get("maxIter", 20000))
    stat_iter = int(conf.get("statIter", 10))
    out = args.outputFolder
    os.makedirs(out, exist_ok=True)

    conf.setdefault("periodic-y", True)
    conf.setdefault("periodic-x", False)
    conf.setdefault("dt", 0.5)
    conf.setdefault("buoyancyScale", 1.0)
    conf.setdefault("gravityVec", {"x": 0.0, "y": 1.0, "z": 0.0})
    cfg = sim_config_from_mconf(conf).replace(
        sim_method=conf.get("simMethod", "jacobi")
    )
    if args.fast:
        # the fused kernels run the first-hit line trace since r3 —
        # --fast no longer trades away the reference's obstacle-aware
        # advection semantics (fluids_init.cpp:300)
        cfg = cfg.replace(use_pallas=True)

    state = create_rayleigh_taylor_scene(
        res_x, res_y,
        rho1=float(conf.get("rho1", -0.01)),
        rho2=float(conf.get("rho2", 0.01)),
        perturb_thickness=float(conf.get("perturbThickness", 100)),
        perturb_amplitude=float(conf.get("perturbAmplitude", 0.01)),
        height=float(conf.get("height", 0.5)),
    )
    it0 = 0
    restart_file = os.path.join(out, "restart.npz")
    if args.restartSim and os.path.isfile(restart_file):
        state, it0 = load_sim_restart(restart_file)

    dist_hist, rho_hist = [], []

    def on_stats(state, it):
        d = float(rt_interface_distance(state.density, res_y))
        m = float(mean_density(state.density))
        dist_hist.append([it * cfg.dt, d])
        rho_hist.append([it * cfg.dt, m])
        np.save(os.path.join(out, "distance.npy"), np.array(dist_hist))
        np.save(os.path.join(out, "avg_density.npy"), np.array(rho_hist))
        plot_sim_snapshot(state, os.path.join(out, f"snap_{it:06d}.png"), it)
        save_sim_restart(restart_file, state, it)
        print(f"  interface distance={d:.3f}  mean rho={m:.6f}")

    run_simulation(
        cfg, state, max_iter, stat_iter, on_stats=on_stats, start_it=it0
    )


if __name__ == "__main__":
    main()
