#!/usr/bin/env python3
"""3-D throughput benchmark: buoyant plume at (default) 128^3.

    python scripts/bench3d.py [--res 128] [--steps 10] [--jacobiIter 60]
        [--modelDir DIR]   # adds the learned PUNet3 projection case

Beyond-reference: the reference's 3-D path is declared broken (README.md:31).
Reports marginal steps/s (two scan lengths, differenced — cancels the fixed
per-invocation executor overhead) for the window and gather advection
engines, plus the learned projection when a 3-D checkpoint is given.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def persist(rows, args):
    """Timestamped JSON artifact under docs/results/ — every 3-D headline
    claim must resolve to a repo path (CLAUDE.md invariant)."""
    try:
        d = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "..", "docs", "results")
        os.makedirs(d, exist_ok=True)
        path = os.path.join(
            d, time.strftime("bench3d_%Y%m%d_%H%M%S.json"))
        with open(path, "w") as f:
            json.dump({
                "res": args.res, "jacobi_iter": args.jacobiIter,
                "dt": args.dt, "steps": args.steps,
                "fuse_advection": args.fuseAdvection,
                "line_trace": args.lineTrace,
                "model_dir": args.modelDir,
                "device": str(jax.devices()[0]),
                "rows": rows,
            }, f, indent=1)
        print(f"artifact written: {path}", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 — persistence is best-effort
        print(f"artifact persistence failed: {e}", file=sys.stderr)


def time_steps(step, state, n):
    def make(k):
        @jax.jit
        def run(s):
            return jax.lax.scan(lambda c, _: (step(c), None), s, None,
                                length=k)[0]
        return run

    run_a, run_b = make(n), make(2 * n)
    s = run_a(state)
    _ = float(jnp.sum(s.density))
    t0 = time.perf_counter()
    s = run_a(s)
    _ = float(jnp.sum(s.density))
    t_a = time.perf_counter() - t0
    s = run_b(s)
    _ = float(jnp.sum(s.density))
    t0 = time.perf_counter()
    s = run_b(s)
    _ = float(jnp.sum(s.density))
    t_b = time.perf_counter() - t0
    return n / max(t_b - t_a, 1e-9), s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--jacobiIter", type=int, default=60)
    ap.add_argument("--dt", type=float, default=0.25)
    ap.add_argument("--modelDir", default=None)
    ap.add_argument("--onlyModel", action="store_true",
                    help="skip the classical rows; run only the learned-"
                         "projection case (fast quality-knob reruns)")
    ap.add_argument("--polishSweeps", type=int, default=None,
                    help="override the checkpoint's polish_sweeps (the "
                         "fused tail makes sweeps ~cheap; more sweeps "
                         "trade ~us for max|div|)")
    ap.add_argument("--fuseAdvection", action="store_true",
                    help="merged scalar+velocity Pallas kernel "
                         "(advect_all3_pallas)")
    ap.add_argument("--lineTrace", action="store_true",
                    help="first-hit obstacle trace in the fused kernels")
    args = ap.parse_args()

    from fluidnet_cxx_tpu.sim import plume_config
    from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
    from fluidnet_cxx_tpu.sim.step3d import simulate_step3
    from fluidnet_cxx_tpu.ops import ops3d

    n = args.res
    state = create_plume_scene3(n, n, n, density_val=0.1,
                                u_scale=0.6 * n / 64.0)
    print(f"device: {jax.devices()[0]} | 3-D plume {n}^3")

    cases = [
        ("pallas fused advection", dict(advection_impl="window",
                                        use_pallas=True)),
        ("pallas + multigrid", dict(advection_impl="window",
                                    use_pallas=True,
                                    sim_method="multigrid",
                                    mg_vcycles=2)),
        ("window (XLA)", dict(advection_impl="window")),
        ("gather", dict(advection_impl="gather")),
    ]
    rows = []
    if args.onlyModel:
        cases = []
    for name, kw in cases:
        cfg = plume_config(
            dt=args.dt, jacobi_iter=args.jacobiIter,
            buoyancy_scale=0.5, gravity_vec=(0.0, -1.0, 0.0),
            line_trace=args.lineTrace, max_disp=2,
            fuse_advection=args.fuseAdvection, **kw,
        )
        try:
            sps, s = time_steps(lambda st: simulate_step3(cfg, st), state,
                                args.steps)
            div = float(jnp.abs(
                ops3d.velocity_divergence3(s.U, s.flags)).max())
        except Exception as e:  # noqa: BLE001 — one row must not kill all
            print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)
            rows.append({"case": name, "error": f"{type(e).__name__}: "
                                                f"{str(e)[:300]}"})
            continue
        print(f"{name:28s} Jacobi-{args.jacobiIter}: {sps:8.2f} steps/s "
              f"({1e3 / sps:.1f} ms/step), max|div|={div:.4f}", flush=True)
        rows.append({"case": name, "sps": round(sps, 2),
                     "ms_per_step": round(1e3 / sps, 2),
                     "max_div": round(div, 5)})

    if args.modelDir:
        from fluidnet_cxx_tpu.models.punet3d import (
            FluidNet3,
            init_params3,
            make_project_fn3,
        )
        from fluidnet_cxx_tpu.train.checkpoint import (
            load_model_config,
            load_train_checkpoint,
        )
        from fluidnet_cxx_tpu.train.trainer import TrainState
        import optax

        import dataclasses

        mcfg = load_model_config(args.modelDir)
        if args.polishSweeps is not None:
            mcfg = dataclasses.replace(mcfg,
                                       polish_sweeps=args.polishSweeps)
        if jax.default_backend() != "cpu" and mcfg.polish_sweeps > 0:
            # whole projection tail in one kernel (proj_tail3_pallas)
            mcfg = dataclasses.replace(mcfg, polish_impl="fused")
        model = FluidNet3(mcfg)
        params = init_params3(model, jax.random.PRNGKey(0), 16, 16, 16)
        opt = optax.adam(1e-4)
        template = TrainState(params, opt.init(params),
                              jnp.zeros((), jnp.int32))
        ts, _, _ = load_train_checkpoint(args.modelDir, template, best=True)
        project = make_project_fn3(model, ts.params)
        engine3 = "flax-fwd+fused-tail"
        if jax.default_backend() != "cpu" and mcfg.punet_refine_convs == 0:
            # whole forward as ONE Pallas kernel (punet3_pallas) — fail
            # SOFT to the flax forward + fused tail, with one forced
            # validation call so a Mosaic rejection can never silently
            # misattribute the row (same ladder as bench.py 2-D).
            try:
                from fluidnet_cxx_tpu.models.punet3d import (
                    make_project_fn3_fused_forward,
                )
                from fluidnet_cxx_tpu.ops import ops3d as _o3

                proj_f = make_project_fn3_fused_forward(
                    model, ts.params, n, n, n)
                pz = jnp.zeros((1, n, n, n), jnp.float32)
                Uz = jnp.ones((1, 3, n, n, n), jnp.float32)
                fz = _o3.empty_domain3(1, n, n, n)
                jax.block_until_ready(jax.jit(proj_f)(pz, Uz, fz, pz))
                project = proj_f
                engine3 = "fused-fwd+fused-tail"
            except Exception as e:  # noqa: BLE001 — degrade, don't die
                print(f"fused 3-D forward rejected ({e}); flax forward",
                      file=sys.stderr, flush=True)
        cfg = plume_config(
            dt=args.dt, sim_method="convnet", buoyancy_scale=0.5,
            gravity_vec=(0.0, -1.0, 0.0), line_trace=args.lineTrace,
            max_disp=2, advection_impl="window", use_pallas=True,
            fuse_advection=args.fuseAdvection,
        )
        try:
            sps, s = time_steps(
                lambda st: simulate_step3(cfg, st, project_fn=project),
                state, args.steps,
            )
            div = float(jnp.abs(
                ops3d.velocity_divergence3(s.U, s.flags)).max())
            print(f"{'PUNet3 learned projection':28s}: {sps:8.2f} steps/s "
                  f"({1e3 / sps:.1f} ms/step), max|div|={div:.4f}")
            rows.append({"case": "punet3 learned", "sps": round(sps, 2),
                         "ms_per_step": round(1e3 / sps, 2),
                         "max_div": round(div, 5),
                         "polish_impl": mcfg.polish_impl,
                         "polish_sweeps": mcfg.polish_sweeps,
                         "engine": engine3})
        except Exception as e:  # noqa: BLE001 — one row must not kill all
            print(f"{'PUNet3 learned projection':28s} FAILED: "
                  f"{type(e).__name__}: {e}", flush=True)
            rows.append({"case": "punet3 learned",
                         "error": f"{type(e).__name__}: {str(e)[:300]}"})

    persist(rows, args)


if __name__ == "__main__":
    main()
