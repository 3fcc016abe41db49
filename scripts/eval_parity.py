#!/usr/bin/env python3
"""Physics-parity evaluation: CNN projection vs Jacobi baselines on the
plume scene (the reference's headline comparison, ref: README.md:11-28,
figures/GrowthRate.png).

Runs the same plume with {CNN, Jacobi-28, Jacobi-100, Jacobi-200}
projections, tracking per-interval:
  * plume front height (max row where density > 0.05 of injection)
  * divergence residual (mean |div| over fluid cells)
Writes growth-rate curves (PNG + npy) and a JSON summary with the
div-residual ratio CNN / Jacobi-100 (north-star target: within 5%).

    python scripts/eval_parity.py --modelDir out/model [--res 128]
        [--iters 1500] [--statIter 50]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def run_case(name, cfg, state, iters, stat_iter, project=None):
    from fluidnet_cxx_tpu import ops
    from fluidnet_cxx_tpu.sim import simulate_step

    @jax.jit
    def chunk(s):
        def body(c, _):
            c = simulate_step(cfg, c, project_fn=project)
            return c, None
        s, _ = jax.lax.scan(body, s, None, length=stat_iter)
        rho = s.density[0]
        h = rho.shape[0]
        present = jnp.max(rho, axis=1) > 0.05 * jnp.max(rho)
        height = jnp.max(jnp.where(present, jnp.arange(h), 0))
        div = ops.velocity_divergence(s.U, s.flags)
        fluid = s.flags == 1
        # Exclude BC-pinned cells (the inlet rows carry an imposed,
        # projection-independent divergence).
        if s.U_bc_inv_mask is not None:
            fluid = fluid & (s.U_bc_inv_mask[:, 1] > 0.5)
        mean_div = jnp.sum(jnp.abs(div) * fluid) / jnp.sum(fluid)
        max_div = jnp.max(jnp.abs(div) * fluid)
        return s, (height, mean_div, max_div)

    heights, mean_divs, max_divs = [], [], []
    s = state
    for _ in range(iters // stat_iter):
        s, (height, mean_div, max_div) = chunk(s)
        heights.append(int(height))
        mean_divs.append(float(mean_div))
        max_divs.append(float(max_div))
    print(
        f"{name:12s} final height {heights[-1]:4d} "
        f"mean|div| {np.mean(mean_divs[1:]):.6f} "
        f"max|div| {np.max(max_divs[1:]):.5f}",
        flush=True,
    )
    return dict(
        name=name, heights=heights, mean_divs=mean_divs, max_divs=max_divs
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modelDir", default=None)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--iters", type=int, default=1500)
    ap.add_argument("--statIter", type=int, default=50)
    ap.add_argument("--out", default="out/parity")
    args = ap.parse_args()

    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config

    os.makedirs(args.out, exist_ok=True)
    res = args.res
    state = create_plume_scene(
        res, res, density_val=0.1, u_scale=2.0 * res / 128.0, rad=0.145
    )

    results = []
    for ji in (28, 100, 200):
        cfg = plume_config(jacobi_iter=ji)
        results.append(
            run_case(f"jacobi-{ji}", cfg, state, args.iters, args.statIter)
        )

    if args.modelDir:
        from fluidnet_cxx_tpu.models import FluidNet, make_project_fn
        from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
        from fluidnet_cxx_tpu.train.checkpoint import (
            load_model_config,
            load_train_checkpoint,
        )

        mcfg = load_model_config(args.modelDir)
        model = FluidNet(mcfg)
        template = init_train_state(
            model, jax.random.PRNGKey(0), TrainConfig(), res, res
        )
        ts, _, _ = load_train_checkpoint(args.modelDir, template, best=True)
        project = make_project_fn(model, ts.params)
        cfg = plume_config(sim_method="convnet")
        results.append(
            run_case("convnet", cfg, state, args.iters, args.statIter,
                     project)
        )

    np.save(os.path.join(args.out, "growth.npy"),
            np.array([r["heights"] for r in results]))
    summary = {r["name"]: {
        "final_height": r["heights"][-1],
        "mean_div": float(np.mean(r["mean_divs"][1:])),
        "max_div": float(np.max(r["max_divs"][1:])),
    } for r in results}
    j100 = summary.get("jacobi-100", {}).get("mean_div")
    if "convnet" in summary and j100:
        summary["convnet_vs_jacobi100_div_ratio"] = (
            summary["convnet"]["mean_div"] / j100
        )
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))

    # growth-rate plot
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 5))
        t = np.arange(1, len(results[0]["heights"]) + 1) * args.statIter
        for r in results:
            ax.plot(t, r["heights"], label=r["name"])
        ax.set_xlabel("iteration")
        ax.set_ylabel("plume front height (cells)")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "growth.png"), dpi=110)
    except Exception as e:
        print("plot failed:", e)


if __name__ == "__main__":
    main()
