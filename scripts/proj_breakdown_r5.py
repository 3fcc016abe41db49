#!/usr/bin/env python3
"""Round-5 projection budget probe (VERDICT r4 item 2: the 164 us).

Times, on the real chip at 512^2, every piece of the learned projection and
the step structure around it, so the CNN-vs-Jacobi-100 gap is attributed to
named microseconds before any kernel is touched:

  assemble  - assemble_inputs (div + UDiv-std scale + stack + occupancy)
  patchify  - space_to_depth(8) + pad to 128 lanes
  fwd       - fused PUNet forward pallas_call (bf16 and f32 variants)
  tail{N}   - fused projection tail at N polish sweeps
  project   - the shipping composition (assemble+fwd+scale+tail)
  cnn_step / jacobi100_step / nostep - full simulate_step in each mode and
              with projection disabled (output_div=True + wall BCs), so
              'step structure' = cnn_step - nostep - project is measured,
              not inferred.

Usage: python scripts/proj_breakdown_r5.py [--res 512] [--sweeps 8 16 32]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def marginal_us(fn, carry0, n=300):
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
    return 1e6 * max(tb - ta, 1e-9) / (3 * n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--modelDir", default="trained_models/PUNetD2_128")
    ap.add_argument("--sweeps", type=int, nargs="*", default=[8, 16, 24, 32])
    args = ap.parse_args()
    res = args.res
    print("device:", jax.devices()[0], flush=True)

    import dataclasses

    from fluidnet_cxx_tpu.models import FluidNet
    from fluidnet_cxx_tpu.models.fluidnet import (
        assemble_inputs,
        make_project_fn_fused_forward,
    )
    from fluidnet_cxx_tpu.models.punet import space_to_depth
    from fluidnet_cxx_tpu.ops.pallas.punet_pallas import make_punet_apply
    from fluidnet_cxx_tpu.ops.pallas.proj_tail_pallas import project_tail_pallas
    from fluidnet_cxx_tpu.ops.stencils import empty_domain
    from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_model_config,
        load_train_checkpoint,
    )

    mcfg = load_model_config(args.modelDir)
    mcfg = dataclasses.replace(mcfg, polish_impl="fused")
    model = FluidNet(mcfg)
    print("building template state ...", flush=True)
    template = init_train_state(model, jax.random.PRNGKey(0), TrainConfig(),
                                res, res)
    print("restoring checkpoint ...", flush=True)
    ts, _, _ = load_train_checkpoint(args.modelDir, template, best=True)
    params = ts.params
    print("checkpoint loaded", flush=True)

    flags = empty_domain(1, res, res)
    key = jax.random.PRNGKey(1)
    U0 = 0.1 * jax.random.normal(key, (1, 2, res, res), jnp.float32)
    p0 = jnp.zeros((1, res, res), jnp.float32)
    rho0 = 0.05 * jax.random.uniform(key, (1, res, res), jnp.float32)

    out = {"res": res}

    # -- assemble --------------------------------------------------------
    def asm(c):
        U = c
        x, s, div = assemble_inputs(mcfg, p0, U, flags, rho0)
        # fold outputs back into the carry so the scan chains
        return U * (1.0 - 1e-7) + 1e-9 * jnp.stack(
            [x[..., 0], div], axis=1) * s[:, None, None, None]

    out["assemble_us"] = marginal_us(asm, U0)
    print(f"assemble_inputs       {out['assemble_us']:8.1f} us", flush=True)

    # -- patchify ---------------------------------------------------------
    patch = mcfg.punet_patch
    g0 = res // patch
    x0 = jnp.zeros((1, res, res, 2), jnp.float32)

    def patc(c):
        xp = space_to_depth(c, patch).reshape(1, g0 * g0, 2 * patch * patch)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0)))
        return c * (1.0 - 1e-7) + 1e-9 * xp.reshape(1, res, res, 2)

    out["patchify_us"] = marginal_us(patc, x0)
    print(f"patchify(s2d8)        {out['patchify_us']:8.1f} us", flush=True)

    # -- forward (bf16 / f32) --------------------------------------------
    pu = params["params"]["PUNet_0"]
    for name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        fwd = make_punet_apply(mcfg, pu, res, res, compute_dtype=dt)

        def f(c):
            y = fwd(c)
            return c * (1.0 - 1e-7) + 1e-6 * jnp.concatenate(
                [y, y], axis=-1)

        out[f"fwd_{name}_us"] = marginal_us(f, x0)
        print(f"fused fwd {name:5s}      {out[f'fwd_{name}_us']:8.1f} us",
              flush=True)

    # -- tail at each sweep count ----------------------------------------
    for n_sw in args.sweeps:
        def tail(c, n_sw=n_sw):
            p, U = c
            p2, U2 = project_tail_pallas(flags, U, p, n_sw,
                                         damping=mcfg.polish_damping)
            return (p2 * (1.0 - 1e-7), U2 * (1.0 - 1e-7))

        out[f"tail{n_sw}_us"] = marginal_us(tail, (p0, U0))
        print(f"tail {n_sw:3d} sweeps      {out[f'tail{n_sw}_us']:8.1f} us",
              flush=True)

    # -- full projection ---------------------------------------------------
    project = make_project_fn_fused_forward(model, params, res, res)

    def proj(c):
        p, U = c
        p2, U2 = project(p, U, flags, rho0)
        return (p2 * (1.0 - 1e-7), U2 * (1.0 - 1e-7))

    out["project_us"] = marginal_us(proj, (p0, U0))
    print(f"full projection       {out['project_us']:8.1f} us", flush=True)

    # -- step structure ----------------------------------------------------
    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    state = create_plume_scene(res, res, density_val=0.1,
                               u_scale=2.0 * res / 128.0, rad=0.145)
    common = dict(use_pallas=True, line_trace=True, dt=0.1, max_disp=4,
                  fuse_advection=True)

    cfgs = {
        "cnn_step": (plume_config(sim_method="convnet", **common), project),
        "jacobi100_step": (plume_config(jacobi_iter=100, **common), None),
        "jacobi28_step": (plume_config(jacobi_iter=28, **common), None),
        "mg2_step": (plume_config(sim_method="multigrid", mg_vcycles=2,
                                  **common), None),
    }
    for name, (cfg, pr) in cfgs.items():
        def st(c, cfg=cfg, pr=pr):
            return simulate_step(cfg, c, project_fn=pr)

        out[f"{name}_us"] = marginal_us(st, state, n=200)
        print(f"{name:20s}  {out[f'{name}_us']:8.1f} us", flush=True)

    # step minus projection: output_div=True stops before wall BCs +
    # projection; add nothing else. The residual (cnn_step - nostep -
    # project) is then the measured convnet glue.
    cfg = cfgs["cnn_step"][0]

    def nostep(c):
        return simulate_step(cfg, c, project_fn=project, output_div=True)

    out["nostep_us"] = marginal_us(nostep, state, n=200)
    print(f"{'step minus proj':20s}  {out['nostep_us']:8.1f} us", flush=True)
    out["glue_us"] = round(
        out["cnn_step_us"] - out["nostep_us"] - out["project_us"], 1)
    print(f"residual glue         {out['glue_us']:8.1f} us", flush=True)

    d = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     "docs", "results")
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, time.strftime("proj_breakdown_r5_%Y%m%d_%H%M%S.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("artifact:", path)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
