#!/usr/bin/env python3
"""Flow-past-cylinder driver (twin of pytorch/cylinder.py).

No-slip (stick) cylinder, left-wall inlet, viscosity from Re
(nu = |u| * D / Re, ref: cylinder.py:208). Default domain is the reference's
8000x800; pass --resX/--resY for smaller runs. The reference driver calls
lib.simulate with a stale signature and NameError-ridden stick BCs; this is
the working equivalent.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resX", type=int, default=8000)
    ap.add_argument("--resY", type=int, default=800)
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--radius", type=float, default=80.5)
    ap.add_argument("--centerX", type=float, default=500.0)
    ap.add_argument("--inletVel", type=float, default=1.0)
    ap.add_argument("--maxIter", type=int, default=5000)
    ap.add_argument("--statIter", type=int, default=50)
    ap.add_argument("--jacobiIter", type=int, default=34)
    ap.add_argument("--outputFolder", default="out/cylinder")
    ap.add_argument("--restartSim", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="fused Pallas kernels where eligible")
    ap.add_argument("--simMethod", default="jacobi",
                    choices=["jacobi", "convnet", "multigrid"])
    ap.add_argument("--modelDir", default="trained_models/PUNetD2_128",
                    help="checkpoint for --simMethod convnet")
    args = ap.parse_args()

    from fluidnet_cxx_tpu.sim import create_cylinder_scene, cylinder_config
    from fluidnet_cxx_tpu.sim.driver import run_simulation
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_sim_restart,
        save_sim_restart,
    )
    from fluidnet_cxx_tpu.utils.plotting import plot_sim_snapshot

    out = args.outputFolder
    os.makedirs(out, exist_ok=True)

    state, viscosity = create_cylinder_scene(
        res_x=args.resX, res_y=args.resY,
        center_x=args.centerX, radius=args.radius,
        inlet_vel=args.inletVel, reynolds=args.re,
    )
    cfg = cylinder_config(viscosity, jacobi_iter=args.jacobiIter)
    if args.simMethod == "multigrid":
        cfg = cfg.replace(sim_method="multigrid")
    if args.fast:
        cfg = cfg.replace(use_pallas=True)
    project = None
    if args.simMethod == "convnet":
        import dataclasses

        import jax

        from fluidnet_cxx_tpu.models import FluidNet, make_project_fn
        from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
        from fluidnet_cxx_tpu.train.checkpoint import (
            load_model_config,
            load_train_checkpoint,
        )

        # (The old Mosaic 'layout mismatch at non-square shapes' is fixed —
        # it was an .at[0] memref_slice at non-128-multiple widths; the
        # sweep kernels now compile at any shape. The checkpoint's own
        # polish_impl is honoured.)
        mcfg = load_model_config(args.modelDir)
        model = FluidNet(mcfg)
        template = init_train_state(
            model, jax.random.PRNGKey(0), TrainConfig(), 64, 64
        )
        ts, _, _ = load_train_checkpoint(args.modelDir, template, best=True)
        project = make_project_fn(model, ts.params)
        cfg = cfg.replace(sim_method="convnet")
    print(f"cylinder {args.resX}x{args.resY}, Re={args.re}, nu={viscosity:.3f}")

    it0 = 0
    restart_file = os.path.join(out, "restart.npz")
    if args.restartSim and os.path.isfile(restart_file):
        state, it0 = load_sim_restart(restart_file)

    def on_stats(state, it):
        plot_sim_snapshot(state, os.path.join(out, f"snap_{it:06d}.png"), it)
        # zoomed wake view around the cylinder for long channels
        if args.resX >= 4 * args.resY:
            x0 = max(int(args.centerX - 3 * args.radius), 0)
            x1 = min(int(args.centerX + 20 * args.radius), args.resX)
            plot_sim_snapshot(
                state, os.path.join(out, f"wake_{it:06d}.png"), it,
                crop=(0, args.resY, x0, x1),
            )
        save_sim_restart(restart_file, state, it)

    run_simulation(
        cfg, state, args.maxIter, args.statIter,
        project_fn=project, on_stats=on_stats, start_it=it0,
    )


if __name__ == "__main__":
    main()
