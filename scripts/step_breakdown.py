#!/usr/bin/env python3
"""Step-time breakdown at the headline 512^2 plume (VERDICT r2 weak #2):
times each phase of the simulation step in isolation (marginal timing over
jitted scans, like bench.py) so the budget 'where do the ms go' question has
a published answer.

    python scripts/step_breakdown.py [--res 512] [--modelDir DIR]

Phases: fused scalar advection, fused velocity self-advection, sources+BCs
(buoyancy + const/inlet), divergence, model forward (PUNet, with and without
polish), polish sweeps (Pallas damped Jacobi), velocity update + wall BCs,
and for comparison the classical Jacobi-28/100 solves and the full step of
each mode. Each phase's output feeds its next input (chained carries) so the
scan cannot be constant-folded.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def marginal_ms(fn, carry0, n=200):
    """Marginal ms per application of carry -> carry fn."""
    def make(k):
        @jax.jit
        def run(c):
            return jax.lax.scan(lambda c, _: (fn(c), None), c, None,
                                length=k)[0]
        return run

    ra, rb = make(n), make(4 * n)
    out = ra(carry0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = ra(out)
    jax.block_until_ready(out)
    ta = time.perf_counter() - t0
    out2 = rb(out)
    jax.block_until_ready(out2)
    t0 = time.perf_counter()
    out2 = rb(out2)
    jax.block_until_ready(out2)
    tb = time.perf_counter() - t0
    return 1e3 * max(tb - ta, 1e-9) / (3 * n)


def _decay(x):
    return x * (1.0 - 1e-7)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--modelDir", default="trained_models/PUNetD2_128")
    ap.add_argument("--n", type=int, default=200)
    args = ap.parse_args()
    res, n = args.res, args.n

    from fluidnet_cxx_tpu import ops
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import (
        advect_scalar_pallas,
        advect_velocity_pallas,
    )
    from fluidnet_cxx_tpu.ops.pallas.jacobi_pallas import solve_jacobi_pallas
    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    state = create_plume_scene(res, res, density_val=0.1,
                               u_scale=2.0 * res / 128.0, rad=0.145)
    cfg = plume_config(dt=0.1, use_pallas=True, line_trace=False)
    flags = state.flags
    # one warm classical step so the timed fields are physical (jitted:
    # an eager step dispatches hundreds of ops through the remote tunnel)
    cfg_warm = cfg.replace(sim_method="jacobi", jacobi_iter=28)
    s = jax.jit(lambda st: simulate_step(cfg_warm, st))(state)
    U, rho = s.U, s.density
    dt, mac = cfg.dt, cfg.maccormack_strength
    div = jax.jit(ops.velocity_divergence)(U, flags)

    out = {}

    def record(name, val):
        out[name] = val
        print(f"{name}: {val:.4f} ms", file=sys.stderr, flush=True)

    record("advect_scalar_pallas", marginal_ms(
        lambda r: _decay(advect_scalar_pallas(
            dt, r, U, flags, maccormack_strength=mac,
            sample_outside_fluid=cfg.sample_outside_fluid,
            max_disp=cfg.max_disp)),
        rho, n))
    record("advect_velocity_pallas", marginal_ms(
        lambda u: _decay(advect_velocity_pallas(
            dt, u, flags, maccormack_strength=mac, max_disp=cfg.max_disp)),
        U, n))

    def sources(c):
        u, r = c
        u = ops.add_buoyancy(u, flags, r,
                             jnp.asarray((0.0, 1.0, 0.0)) * (-0.25), 0.0, dt)
        u = u * s.U_bc_inv_mask + s.U_bc
        r = r * s.density_bc_inv_mask + s.density_bc
        return _decay(u), _decay(r)

    record("sources_bcs", marginal_ms(sources, (U, rho), n))
    record("divergence", marginal_ms(
        lambda u: _decay(
            u + 1e-30 * ops.velocity_divergence(u, flags)[:, None]),
        U, n))

    record("jacobi28_pallas", marginal_ms(
        lambda d: _decay(solve_jacobi_pallas(flags, d, 28)) + 1e-30 * d,
        div, n))
    record("jacobi100_pallas", marginal_ms(
        lambda d: _decay(solve_jacobi_pallas(flags, d, 100)) + 1e-30 * d,
        div, max(n // 2, 50)))
    record("polish32_damped_pallas", marginal_ms(
        lambda d: _decay(solve_jacobi_pallas(flags, d, 32, p0=d,
                                             damping=2.0 / 3.0)) + 1e-30 * d,
        div, n))
    record("velocity_update_wallbcs", marginal_ms(
        lambda c: (_decay(c[0]),
                   _decay(ops.set_wall_bcs(
                       ops.velocity_update(c[0], c[1], flags), flags))),
        (div, U), n))

    try:
        import dataclasses

        from fluidnet_cxx_tpu.models import FluidNet, make_project_fn
        from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
        from fluidnet_cxx_tpu.train.checkpoint import (
            load_model_config,
            load_train_checkpoint,
        )

        mcfg = load_model_config(args.modelDir)
        model_np = FluidNet(dataclasses.replace(mcfg, polish_sweeps=0))
        template = init_train_state(model_np, jax.random.PRNGKey(0),
                                    TrainConfig(), res, res)
        ts, _, _ = load_train_checkpoint(args.modelDir, template, best=True)
        model_pol = FluidNet(dataclasses.replace(mcfg, polish_impl="pallas"))

        def fwd(model):
            def f(c):
                p, u = c
                p2, u2 = model.apply(ts.params, p, u, flags, rho)
                return _decay(p2), _decay(u2)
            return f

        record("model_forward_nopolish", marginal_ms(
            fwd(model_np), (div, U), n))
        record("model_forward_with_polish", marginal_ms(
            fwd(model_pol), (div, U), n))

        project = make_project_fn(model_pol, ts.params)
        cfg_cnn = cfg.replace(sim_method="convnet")
        record("full_step_convnet", marginal_ms(
            lambda st: simulate_step(cfg_cnn, st, project_fn=project), s, n))
    except Exception as e:
        print(f"model phases skipped: {e}", file=sys.stderr)

    for ji in (28, 100):
        cfg_j = cfg.replace(sim_method="jacobi", jacobi_iter=ji)
        record(f"full_step_jacobi{ji}", marginal_ms(
            lambda st, c=cfg_j: simulate_step(c, st), s, n))

    out["sum_of_convnet_phases"] = sum(
        out.get(k, 0.0)
        for k in ("advect_scalar_pallas", "advect_velocity_pallas",
                  "sources_bcs", "divergence",
                  "model_forward_with_polish", "velocity_update_wallbcs"))
    print(json.dumps({k: round(v, 4) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
