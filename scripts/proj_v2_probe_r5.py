#!/usr/bin/env python3
"""Round-5 projection-v2 validation + polish-sweep quality gate (512^2).

Measures on the real chip, for the glue-folded projection (f32 fused
forward w/ in-kernel normalisation, fused tail w/ in-kernel scale + inlet
BCs, inlet-folded convnet step — VERDICT r4 item 2):

  1. marginal projection time and full cnn step time (vs the r5 breakdown
     artifact's 267.2 / 1156.8 us baselines);
  2. rollout quality (mean/max |div| + plume height) at polish sweeps
     {16, 24, 32} against Jacobi-100's row, so the sweep count can be cut
     to the minimum that still beats Jacobi-100 on BOTH div columns;
  3. the stride-8 patch-embed conv vs the s2d transpose (79 us measured).

Writes docs/results/proj_v2_r5_<ts>.json.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    print("device:", jax.devices()[0], flush=True)
    import bench
    from fluidnet_cxx_tpu.models import FluidNet, make_project_fn_fused_forward
    from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_model_config,
        load_train_checkpoint,
    )
    from scripts.proj_breakdown_r5 import marginal_us

    res = 512
    model_dir = os.environ.get("BENCH_MODEL_DIR", "trained_models/PUNetD2_128")
    base_cfg = load_model_config(model_dir)
    out = {"res": res, "model_dir": model_dir}

    def build(sweeps):
        mcfg = dataclasses.replace(base_cfg, polish_impl="fused",
                                   polish_sweeps=sweeps)
        model = FluidNet(mcfg)
        template = init_train_state(model, jax.random.PRNGKey(0),
                                    TrainConfig(), res, res)
        ts, _, _ = load_train_checkpoint(model_dir, template, best=True)
        return make_project_fn_fused_forward(model, ts.params, res, res)

    # -- 1. marginal timings at the shipped sweep count --------------------
    project = build(base_cfg.polish_sweeps)
    from fluidnet_cxx_tpu.ops.stencils import empty_domain

    flags = empty_domain(1, res, res)
    key = jax.random.PRNGKey(1)
    U0 = 0.1 * jax.random.normal(key, (1, 2, res, res), jnp.float32)
    p0 = jnp.zeros((1, res, res), jnp.float32)
    rho0 = jnp.zeros((1, res, res), jnp.float32)

    def proj(c):
        p, U = c
        p2, U2 = project(p, U, flags, rho0)
        return (p2 * (1.0 - 1e-7), U2 * (1.0 - 1e-7))

    out["project_v2_us"] = marginal_us(proj, (p0, U0))
    print(f"project v2 (sweeps={base_cfg.polish_sweeps}): "
          f"{out['project_v2_us']:.1f} us (r5 baseline 267.2)", flush=True)

    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    state = create_plume_scene(res, res, density_val=0.1, u_scale=8.0,
                               rad=0.145)
    scfg = plume_config(sim_method="convnet", use_pallas=True,
                        line_trace=True, dt=0.1, max_disp=4,
                        fuse_advection=True)

    def st(c):
        return simulate_step(scfg, c, project_fn=project)

    out["cnn_step_v2_us"] = marginal_us(st, state, n=200)
    print(f"cnn step v2: {out['cnn_step_v2_us']:.1f} us "
          f"(r5 baselines: cnn 1156.8, jacobi100 1020.6)", flush=True)

    # -- 2. rollout quality at each sweep count ----------------------------
    for sweeps in (16, 24, 32):
        pj = build(sweeps)
        rec = bench.run_case(f"cnn-v2-p{sweeps}", res,
                             dict(sim_method="convnet"), project=pj,
                             rollout=300, n_time=100, reps=2,
                             engine=f"v2-fused-p{sweeps}")
        out[f"cnn_p{sweeps}"] = rec
    out["jacobi100"] = bench.run_case("jacobi-100", res,
                                      dict(jacobi_iter=100), rollout=300,
                                      n_time=100, reps=2, engine="jacobi")

    # -- 2b. 128^2 (VERDICT r4 item 7): damped-sweep polish vs a 1-V-cycle
    # multigrid polish. The flagship's 128^2 max|div| (0.0202) is 2.8x
    # Jacobi-100's; the hypothesis is patch-seam modes the damped sweeps
    # can't kill but one V-cycle can (mg-2v reaches 0.0047 there).
    def build128(sweeps, impl):
        mcfg = dataclasses.replace(base_cfg, polish_impl=impl,
                                   polish_sweeps=sweeps)
        model = FluidNet(mcfg)
        template = init_train_state(model, jax.random.PRNGKey(0),
                                    TrainConfig(), 128, 128)
        ts, _, _ = load_train_checkpoint(model_dir, template, best=True)
        return make_project_fn_fused_forward(model, ts.params, 128, 128)

    for name, sweeps, impl in (("fused32", 32, "fused"),
                               ("fused64", 64, "fused"),
                               ("mg1v", 32, "mg")):
        try:
            pj = build128(sweeps, impl)
            rec = bench.run_case(f"cnn128-{name}", 128,
                                 dict(sim_method="convnet"), project=pj,
                                 rollout=400, n_time=1000, reps=3,
                                 engine=f"v2-{name}")
            out[f"cnn128_{name}"] = rec
        except Exception as e:  # noqa: BLE001 — one row must not kill all
            print(f"128^2 {name} failed: {e}", flush=True)
            out[f"cnn128_{name}"] = {"error": str(e)[:200]}
    out["jacobi100_128"] = bench.run_case(
        "jacobi-100", 128, dict(jacobi_iter=100), rollout=400,
        n_time=1000, reps=3, engine="jacobi")
    out["mg2_128"] = bench.run_case(
        "mg-2v", 128, dict(sim_method="multigrid", mg_vcycles=2),
        rollout=400, n_time=1000, reps=3, engine="mg")

    # -- 3. stride-8 patch-embed conv vs s2d transpose ---------------------
    x = jnp.zeros((1, res, res, 2), jnp.float32)
    kern = jnp.asarray(np.random.default_rng(0).standard_normal(
        (8, 8, 2, 96)), jnp.float32)

    def pe(c):
        y = jax.lax.conv_general_dilated(
            c, kern, window_strides=(8, 8), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return c * (1.0 - 1e-7) + 1e-12 * jnp.sum(y)

    try:
        out["patch_embed_conv_us"] = marginal_us(pe, x)
        print(f"stride-8 conv embed: {out['patch_embed_conv_us']:.1f} us "
              f"(s2d transpose baseline 79.2)", flush=True)
    except Exception as e:  # noqa: BLE001 — diagnostics only
        out["patch_embed_conv_us"] = None
        print(f"patch-embed conv probe failed: {e}")

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "docs", "results")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, time.strftime("proj_v2_r5_%Y%m%d_%H%M%S.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1, default=float)
    print("artifact:", path)
    print(json.dumps(out, default=float))


if __name__ == "__main__":
    main()
