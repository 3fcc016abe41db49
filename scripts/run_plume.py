#!/usr/bin/env python3
"""Buoyant-plume simulation driver (twin of pytorch/plume.py).

    python scripts/run_plume.py [--simConf configs/plume.yaml]
        [--modelDir DIR] [--outputFolder DIR] [--restartSim] [--simMethod X]

Reads a plumeConfig-style YAML (reference-compatible keys), builds the inlet
scene, steps the simulation, and writes plots / VTK / restart snapshots every
``statIter`` iterations.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import yaml


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--simConf", default=None, help="YAML sim config")
    ap.add_argument("--modelDir", default=None,
                    help="trained-model dir (for simMethod=convnet)")
    ap.add_argument("--outputFolder", default="out/plume")
    ap.add_argument("--restartSim", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="fused Pallas kernels + no line trace (bit-exact "
                         "kernels; the trace is inert without interior "
                         "obstacles)")
    ap.add_argument("--simMethod", default=None,
                    choices=[None, "convnet", "jacobi", "multigrid",
                             "mg_learned"])
    ap.add_argument("--resX", type=int, default=None)
    ap.add_argument("--resY", type=int, default=None)
    ap.add_argument("--maxIter", type=int, default=None)
    args = ap.parse_args()

    from fluidnet_cxx_tpu.config import sim_config_from_mconf
    from fluidnet_cxx_tpu.sim import create_plume_scene
    from fluidnet_cxx_tpu.sim.driver import run_simulation
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_sim_restart,
        save_sim_restart,
    )
    from fluidnet_cxx_tpu.utils.plotting import plot_sim_snapshot
    from fluidnet_cxx_tpu.utils.vtk_export import write_vtk

    conf = {}
    if args.simConf:
        with open(args.simConf) as f:
            conf = yaml.safe_load(f) or {}
    # CLI overrides YAML (reference convention).
    for k in ("simMethod", "modelDir", "outputFolder", "resX", "resY",
              "maxIter"):
        v = getattr(args, k, None)
        if v is not None:
            conf[k] = v

    res_x = int(conf.get("resX", 128))
    res_y = int(conf.get("resY", 128))
    max_iter = int(conf.get("maxIter", 20000))
    stat_iter = int(conf.get("statIter", 100))
    method = conf.get("simMethod", "jacobi")
    out = conf.get("outputFolder", "out/plume")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "sim_config.yaml"), "w") as f:
        yaml.safe_dump(conf, f)

    cfg = sim_config_from_mconf(conf).replace(sim_method=method)
    if args.fast:
        # the fused kernels run the first-hit line trace since r3 —
        # --fast no longer trades away the reference's obstacle-aware
        # advection semantics (fluids_init.cpp:300)
        cfg = cfg.replace(use_pallas=True)

    project = None
    if method == "mg_learned":
        # Hybrid: ONE V-cycle with the learned coarse-grid correction
        # (models/mg_coarse.py). Rides the convnet dispatch — the hybrid
        # is just a projection callable.
        from fluidnet_cxx_tpu.models import (
            load_mg_coarse,
            make_project_fn_mg_learned,
        )

        mgc_model, mgc_params = load_mg_coarse(conf["modelDir"])
        project = make_project_fn_mg_learned(mgc_model, mgc_params)
        method = "convnet"
        cfg = cfg.replace(sim_method="convnet")
    if method == "convnet" and project is None:
        from fluidnet_cxx_tpu.models import FluidNet, make_project_fn
        from fluidnet_cxx_tpu.train.checkpoint import (
            load_model_config,
            load_train_checkpoint,
        )
        from fluidnet_cxx_tpu.train import init_train_state, TrainConfig

        model_dir = conf["modelDir"]
        mcfg = load_model_config(model_dir)
        model = FluidNet(mcfg)
        template = init_train_state(
            model, jax.random.PRNGKey(0), TrainConfig(), res_y, res_x
        )
        ts, _, _ = load_train_checkpoint(model_dir, template)
        project = make_project_fn(model, ts.params)

    state = create_plume_scene(
        res_x, res_y,
        density_val=float(conf.get("injectionDensity", 1.0)),
        u_scale=float(conf.get("injectionVelocity", 1.0)),
        rad=float(conf.get("sourceRadius", 0.2)),
    )
    it0 = 0
    restart_file = os.path.join(out, "restart.npz")
    if args.restartSim and os.path.isfile(restart_file):
        state, it0 = load_sim_restart(restart_file)
        print(f"restarting at it={it0}")

    save_vtk = bool(conf.get("saveVTK", False))
    save_png = bool(conf.get("realTimePlot", True))

    def on_stats(state, it):
        if save_png:
            plot_sim_snapshot(
                state, os.path.join(out, f"snap_{it:06d}.png"), it
            )
        if save_vtk:
            write_vtk(os.path.join(out, f"snap_{it:06d}.vtk"), state)
        save_sim_restart(restart_file, state, it)

    run_simulation(
        cfg, state, max_iter, stat_iter,
        project_fn=project, on_stats=on_stats, start_it=it0,
    )


if __name__ == "__main__":
    main()
