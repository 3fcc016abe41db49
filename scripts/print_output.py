#!/usr/bin/env python3
"""Run a trained model over the test set and plot out-vs-target fields
(twin of pytorch/print_output.py).

    python scripts/print_output.py --modelDir DIR --dataDir DIR [--n 4]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modelDir", required=True)
    ap.add_argument("--dataDir", required=True)
    ap.add_argument("--n", type=int, default=4, help="frames to plot")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from fluidnet_cxx_tpu import ops
    from fluidnet_cxx_tpu.data import FluidDataset, sample_to_batch
    from fluidnet_cxx_tpu.models import FluidNet
    from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_model_config,
        load_train_checkpoint,
    )
    from fluidnet_cxx_tpu.utils.plotting import plot_field

    out = args.out or os.path.join(args.modelDir, "eval_plots")
    os.makedirs(out, exist_ok=True)

    ds = FluidDataset(args.dataDir, "te")
    mcfg = load_model_config(args.modelDir)
    model = FluidNet(mcfg)
    template = init_train_state(
        model, jax.random.PRNGKey(0), TrainConfig(), ds.h, ds.w
    )
    ts, epoch, best = load_train_checkpoint(args.modelDir, template)
    print(f"loaded checkpoint @ epoch {epoch} (best val {best:.5f})")

    apply = jax.jit(lambda p, U, f, r: model.apply(ts.params, p, U, f, r))
    batch = sample_to_batch(next(ds.batches(args.n, shuffle=False)))
    p_out, U_out = apply(
        batch.p_div, batch.U_div, batch.flags, batch.density_div
    )
    div_out = ops.velocity_divergence(U_out, batch.flags)
    div_tgt = ops.velocity_divergence(batch.U_target, batch.flags)

    for i in range(args.n):
        f = np.asarray(batch.flags)[i]
        plot_field(np.asarray(p_out)[i], np.asarray(batch.p_target)[i], f,
                   os.path.join(out, f"p_{i:03d}.png"), "pressure")
        plot_field(np.asarray(U_out)[i, 0],
                   np.asarray(batch.U_target)[i, 0], f,
                   os.path.join(out, f"u_{i:03d}.png"), "u")
        plot_field(np.asarray(div_out)[i], np.asarray(div_tgt)[i], f,
                   os.path.join(out, f"div_{i:03d}.png"), "divergence")
    print(
        f"mean|div| model={np.abs(np.asarray(div_out)).mean():.5f} "
        f"target={np.abs(np.asarray(div_tgt)).mean():.5f}; plots in {out}"
    )


if __name__ == "__main__":
    main()
