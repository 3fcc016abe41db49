#!/usr/bin/env python3
"""Diagnose WHERE the learned projection leaves divergence.

    python scripts/div_diagnose.py --modelDir trained_models/PUNetD_512
        [--res 512] [--iters 400]

Rolls the plume with the learned projection and with Jacobi-100, then
reports the |div| field decomposed by (a) spatial band (distance from the
inlet axis / plume front) and (b) radial frequency band (FFT shells) —
distinguishing "the net misses high-frequency detail" (polish-fixable)
from "the net misses mid/low-frequency structure" (architecture-limited).
Writes a side-by-side |div| heatmap PNG.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def rollout(cfg, state, iters, project=None):
    from fluidnet_cxx_tpu.sim import simulate_step

    @jax.jit
    def run(s):
        def body(c, _):
            return simulate_step(cfg, c, project_fn=project), None
        return jax.lax.scan(body, s, None, length=iters)[0]

    return run(state)


def band_report(name, div, fl):
    a = np.abs(np.asarray(div))[0] * np.asarray(fl)[0]
    h, w = a.shape
    # frequency shells of the divergence field
    F = np.abs(np.fft.fft2(np.asarray(div)[0] * np.asarray(fl)[0]))
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy * fy + fx * fx)
    shells = [(0, 1 / 64), (1 / 64, 1 / 16), (1 / 16, 1 / 4), (1 / 4, 1.0)]
    tot = np.sqrt((F ** 2).sum())
    parts = []
    for lo, hi in shells:
        m = (r >= lo) & (r < hi)
        parts.append(np.sqrt((F[m] ** 2).sum()) / max(tot, 1e-12))
    print(
        f"{name:12s} mean|div|={a.sum() / max(np.asarray(fl).sum(), 1):.6f} "
        f"max={a.max():.4f} | energy: lam>64c {parts[0]:.2f}  "
        f"64-16c {parts[1]:.2f}  16-4c {parts[2]:.2f}  <4c {parts[3]:.2f}"
    )
    return a


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modelDir", required=True)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--out", default="out/div_diag")
    args = ap.parse_args()

    import dataclasses

    from fluidnet_cxx_tpu import ops
    from fluidnet_cxx_tpu.models import FluidNet, make_project_fn
    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config
    from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_model_config,
        load_train_checkpoint,
    )

    res = args.res
    os.makedirs(args.out, exist_ok=True)
    state0 = create_plume_scene(
        res, res, density_val=0.1, u_scale=2.0 * res / 128.0, rad=0.145
    )
    fl = (state0.flags == 1) & (state0.U_bc_inv_mask[:, 1] > 0.5)
    fast = dict(use_pallas=jax.default_backend() != "cpu", line_trace=False)

    mcfg = load_model_config(args.modelDir)
    if fast["use_pallas"] and mcfg.polish_sweeps > 0:
        mcfg = dataclasses.replace(mcfg, polish_impl="pallas")
    model = FluidNet(mcfg)
    template = init_train_state(
        model, jax.random.PRNGKey(0), TrainConfig(), res, res
    )
    ts, _, _ = load_train_checkpoint(args.modelDir, template, best=True)
    project = make_project_fn(model, ts.params)

    s_cnn = rollout(plume_config(sim_method="convnet", **fast), state0,
                    args.iters, project)
    s_j = rollout(plume_config(jacobi_iter=100, **fast), state0, args.iters)

    d_cnn = ops.velocity_divergence(s_cnn.U, s_cnn.flags)
    d_j = ops.velocity_divergence(s_j.U, s_j.flags)
    a_cnn = band_report("convnet", d_cnn, fl)
    a_j = band_report("jacobi-100", d_j, fl)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(2, 2, figsize=(11, 10))
        for ax, (img, title) in zip(
            axes.flat,
            [
                (np.asarray(s_cnn.density)[0], "density (convnet)"),
                (np.asarray(s_j.density)[0], "density (jacobi-100)"),
                (a_cnn, "|div| convnet"),
                (a_j, "|div| jacobi-100"),
            ],
        ):
            vmax = img.max() if "density" in title else max(
                a_cnn.max(), a_j.max()
            )
            im = ax.imshow(img, origin="lower", cmap="magma", vmax=vmax)
            ax.set_title(title)
            fig.colorbar(im, ax=ax, shrink=0.8)
        fig.tight_layout()
        path = os.path.join(args.out, f"diag_{res}.png")
        fig.savefig(path, dpi=100)
        print("wrote", path)
    except Exception as e:
        print("plot failed:", e)


if __name__ == "__main__":
    main()
