#!/usr/bin/env python3
"""Train the learned 3-D projection prototype (PUNet3).

    python scripts/train3d.py [--steps N] [--res 32] [--bsz 4]
        [--labelIters 400] [--polishSweeps 8] [--modelDir DIR]

On-device synthetic batches (data/synthetic3.py) with Jacobi-labelled
targets; short-term divergence loss. Beyond-reference: the reference's 3-D
code paths are declared buggy and it has no 3-D training at all
(ref: README.md:31).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from functools import partial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--bsz", type=int, default=4)
    ap.add_argument("--labelIters", type=int, default=400)
    ap.add_argument("--polishSweeps", type=int, default=8)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--patch", type=int, default=4)
    ap.add_argument("--modelDir", default="trained_models/PUNet3_32")
    args = ap.parse_args()

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.data.synthetic3 import generate_batch3
    from fluidnet_cxx_tpu.models.punet3d import FluidNet3, init_params3
    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.train.checkpoint import save_train_checkpoint
    from fluidnet_cxx_tpu.train.trainer import TrainState

    mcfg = ModelConfig(
        model="PUNet3",
        punet_patch=args.patch,
        punet_widths=(96, 128),
        punet_bottleneck_convs=2,
        polish_sweeps=args.polishSweeps,
        compute_dtype="bfloat16",
        normalize_input_chan="UDiv",
    )
    model = FluidNet3(mcfg)
    r = args.res
    params = init_params3(model, jax.random.PRNGKey(0), r, r, r)
    opt = optax.adam(args.lr)
    ts = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))

    def loss_fn(params, batch):
        U_div, flags, p_t, U_t = batch
        zero = jnp.zeros_like(p_t)
        _, U_out = model.apply(params, zero, U_div, flags, zero)
        div = ops3d.velocity_divergence3(U_out, flags)
        return jnp.mean(div * div)

    CHUNK = 5

    @partial(jax.jit, donate_argnums=0)
    def step(ts, key):
        def body(ts, k):
            batch = generate_batch3(k, args.bsz, r, r, r, args.labelIters)
            loss, grads = jax.value_and_grad(loss_fn)(ts.params, batch)
            updates, opt_state = opt.update(grads, ts.opt_state, ts.params)
            params = optax.apply_updates(ts.params, updates)
            return TrainState(params, opt_state, ts.step + 1), loss

        return jax.lax.scan(body, ts, jax.random.split(key, CHUNK))

    key = jax.random.PRNGKey(7)
    t0 = time.time()
    best = float("inf")
    os.makedirs(args.modelDir, exist_ok=True)
    for i in range(CHUNK, args.steps + 1, CHUNK):
        key, sub = jax.random.split(key)
        ts, losses = step(ts, sub)
        if i % 50 == 0 or i >= args.steps:
            loss = float(np.mean(np.asarray(losses)))
            is_best = loss < best
            best = min(best, loss)
            save_train_checkpoint(args.modelDir, ts, i, best, mcfg,
                                  is_best=is_best)
            print(
                f"step {i}/{args.steps}: divL2 {loss:.6f}"
                f"{' *best*' if is_best else ''} "
                f"{50 / (time.time() - t0):.2f} steps/s",
                flush=True,
            )
            t0 = time.time()

    # Report the projection quality of the final params vs the Jacobi label.
    # (jit the generator: the complex FFT ops are jit-only on this backend)
    batch = jax.jit(
        lambda k: generate_batch3(k, 2, r, r, r, args.labelIters)
    )(jax.random.PRNGKey(99))
    U_div, flags, p_t, U_t = batch
    zero = jnp.zeros_like(p_t)
    _, U_out = model.apply(ts.params, zero, U_div, flags, zero)
    d_in = jnp.abs(ops3d.velocity_divergence3(U_div, flags)).mean()
    d_out = jnp.abs(ops3d.velocity_divergence3(U_out, flags)).mean()
    d_lbl = jnp.abs(ops3d.velocity_divergence3(U_t, flags)).mean()
    print(
        f"mean|div|: input {float(d_in):.5f} -> learned {float(d_out):.5f} "
        f"(Jacobi-{args.labelIters} label: {float(d_lbl):.5f})"
    )


if __name__ == "__main__":
    main()
