#!/usr/bin/env python3
"""Training driver (twin of pytorch/fluid_net_train.py).

    python scripts/train.py --trainConfig configs/train.yaml
        [--dataDir DIR | --synthetic N] [--modelDir DIR] [--resume]
        [--maxEpochs N] [--bsz N] [--lr X]

Data: either a preprocessed Mantaflow dataset directory (tr/ and te/ scene
folders of .npz frames — see fluidnet_cxx_tpu.data.preprocess_manta_scenes)
or ``--synthetic N`` to materialise N scenes of solver-labelled synthetic
data first.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import yaml
from functools import partial


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trainConfig", default=None)
    ap.add_argument("--dataDir", default=None)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic scenes into dataDir first")
    ap.add_argument("--modelDir", default="out/model")
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--resetOpt", action="store_true",
                    help="on resume, keep params but reinitialise optimizer")
    ap.add_argument("--maxEpochs", type=int, default=None)
    ap.add_argument("--bsz", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--res", type=int, default=128,
                    help="grid size for synthetic data")
    ap.add_argument("--model", default=None,
                    choices=["FluidNet", "ScaleNet", "PUNet"])
    ap.add_argument("--punetWidths", default=None,
                    help="comma-separated PUNet level widths, e.g. 96,128,128")
    ap.add_argument("--punetDilation", type=int, default=None,
                    help="PUNet bottleneck conv dilation")
    ap.add_argument("--polishSweeps", type=int, default=None,
                    help="warm-started Jacobi polish sweeps inside the "
                         "learned projection (ModelConfig.polish_sweeps)")
    ap.add_argument("--evalRes", type=int, default=None,
                    help="plume resolution for --evalSelect (default: --res)")
    ap.add_argument("--onDevice", type=int, default=0,
                    help="train N steps with batches generated on-device "
                         "(no host dataset; fastest on TPU)")
    ap.add_argument("--plumeFrames", type=int, default=0,
                    help="collect N pre-projection plume rollout frames "
                         "on-device and mix them into training (closes the "
                         "train/rollout distribution gap)")
    ap.add_argument("--synthFrac", type=float, default=0.5,
                    help="fraction of synthetic samples when --plumeFrames")
    ap.add_argument("--pL2", type=float, default=None,
                    help="pressure-matching loss weight (anchors the "
                         "projection to the solver's unique solution)")
    ap.add_argument("--labelIters", type=int, default=600,
                    help="Jacobi iterations for on-device labels")
    ap.add_argument("--evalSelect", action="store_true",
                    help="select the best checkpoint by a closed-loop plume "
                         "rollout divergence metric instead of train loss")
    args = ap.parse_args()

    from fluidnet_cxx_tpu.config import (
        model_config_from_mconf,
        sim_config_from_mconf,
        train_config_from_yaml,
    )
    from fluidnet_cxx_tpu.data import (
        FluidDataset,
        sample_to_batch,
        write_synthetic_dataset,
    )
    from fluidnet_cxx_tpu.models import FluidNet
    from fluidnet_cxx_tpu.train import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )
    from fluidnet_cxx_tpu.train.checkpoint import (
        load_train_checkpoint,
        save_train_checkpoint,
    )
    from fluidnet_cxx_tpu.utils.diagnostics import LossLogger

    conf = {}
    if args.trainConfig:
        with open(args.trainConfig) as f:
            conf = yaml.safe_load(f) or {}
    mconf = conf.get("modelParam", {}) or {}
    import dataclasses

    tc = train_config_from_yaml(conf)
    if args.maxEpochs:
        tc = dataclasses.replace(tc, max_epochs=args.maxEpochs)
    if args.bsz:
        tc = dataclasses.replace(tc, batch_size=args.bsz)
    if args.lr:
        tc = dataclasses.replace(tc, lr=args.lr)
    if args.pL2 is not None:
        tc = dataclasses.replace(tc, p_l2_lambda=args.pL2)
    if args.model:
        mconf["model"] = args.model
    if args.polishSweeps is not None:
        mconf["polishSweeps"] = args.polishSweeps
    if args.punetWidths:
        mconf["punetWidths"] = [int(x) for x in args.punetWidths.split(",")]
    if args.punetDilation is not None:
        mconf["punetBottleneckDilation"] = args.punetDilation
    mcfg = model_config_from_mconf(mconf)
    scfg = sim_config_from_mconf(mconf)

    if args.onDevice:
        from fluidnet_cxx_tpu.train.trainer import make_on_device_train_step
        from fluidnet_cxx_tpu.train.checkpoint import save_train_checkpoint

        model = FluidNet(mcfg)
        opt = make_optimizer(tc, steps_per_epoch=50)
        ts = init_train_state(
            model, jax.random.PRNGKey(0), tc, args.res, args.res, opt
        )
        epoch0, best = 0, float("inf")
        if args.resume:
            from fluidnet_cxx_tpu.train.trainer import TrainState

            ts, epoch0, best = load_train_checkpoint(
                args.modelDir, ts, best=args.resetOpt
            )
            if args.resetOpt:
                ts = TrainState(ts.params, opt.init(ts.params),
                                jnp.zeros((), jnp.int32))
                best = float("inf")
            print(f"resumed at step {int(ts.step)}")
        if args.plumeFrames:
            from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config
            from fluidnet_cxx_tpu.train.trainer import (
                collect_rollout_frames,
                make_mixed_train_step,
            )

            print(f"collecting {args.plumeFrames} plume rollout frames "
                  f"at {args.res}^2...", flush=True)
            roll_cfg = plume_config(
                jacobi_iter=200,
                use_pallas=jax.default_backend() != "cpu",
                line_trace=False,
            )
            scene = create_plume_scene(
                args.res, args.res, density_val=0.1,
                u_scale=2.0 * args.res / 128.0, rad=0.145,
            )
            frames, frame_p, frame_flags = collect_rollout_frames(
                roll_cfg, scene, args.plumeFrames, stride=4, warmup=50,
            )
            frames = jax.block_until_ready(frames)
            print(f"frames ready: {frames.shape}", flush=True)
            inner = make_mixed_train_step(
                model, scfg, tc, frames.shape, tc.batch_size,
                synth_frac=args.synthFrac, jacobi_iters=args.labelIters,
                optimizer=opt,
            )
            # divergence-loss mask: exclude the inlet's BC-clamped cells
            # (the step re-imposes them post-projection; penalising their
            # divergence teaches jet suppression — see train/losses.py)
            frame_div_mask = (scene.U_bc_inv_mask[:, 1] > 0.5) & (
                scene.U_bc_inv_mask[:, 0] > 0.5
            )
            extra = (frames, frame_p, frame_flags, frame_div_mask)
        else:
            inner = make_on_device_train_step(
                model, scfg, tc, args.res, args.res,
                tc.batch_size, args.labelIters, opt,
            )
            extra = ()
        # Steps fused per dispatch: amortises the ~45 ms tunnel latency at
        # small resolutions; at >= 256^2 a single step costs hundreds of ms
        # (latency is noise) and the 10x-unrolled graph has broken the
        # remote-compile transport, so dispatch one step at a time.
        CHUNK = 10 if args.res < 256 else 1

        @partial(jax.jit, donate_argnums=0)
        def step(ts, key, *extra):
            def body(carry, k):
                ts, _ = carry
                ts, terms = inner(ts, k, *extra)
                return (ts, terms), None
            from fluidnet_cxx_tpu.train.losses import LossTerms

            zero_terms = LossTerms(*([jnp.zeros(())] * 6))
            (ts, terms), _ = jax.lax.scan(
                body, (ts, zero_terms), jax.random.split(key, CHUNK)
            )
            return ts, terms
        os.makedirs(args.modelDir, exist_ok=True)
        log = LossLogger(os.path.join(args.modelDir, "train_loss.npy"))
        key = jax.random.PRNGKey(4321)

        eval_rollout = None
        if args.evalSelect:
            # Closed-loop selection metric: mean |div| over non-inlet fluid
            # cells after a 400-step plume rollout PLUS a growth-parity
            # penalty vs a Jacobi-100 rollout of the same scene. Divergence
            # alone is gameable: a net that suppresses the inlet jet gets a
            # LOW residual on a dead flow (observed r2 at 512^2 — see
            # RESULTS.md); the plume-front height anchors the physics
            # (the reference's own headline metric, README.md:11-28).
            from fluidnet_cxx_tpu import ops as _ops
            from fluidnet_cxx_tpu.sim import (
                create_plume_scene,
                plume_config,
                simulate_step,
            )

            eres = args.evalRes or args.res
            eval_state0 = create_plume_scene(
                eres, eres, density_val=0.1, u_scale=2.0 * eres / 128.0,
                rad=0.145,
            )
            cfg_eval = plume_config(sim_method="convnet")
            fl_mask = (eval_state0.flags == 1) & (
                eval_state0.U_bc_inv_mask[:, 1] > 0.5
            )

            def plume_height(s):
                rho = s.density[0]
                present = (
                    jnp.max(rho, axis=1) > 0.05 * jnp.max(rho)
                )
                return jnp.max(
                    jnp.where(present, jnp.arange(rho.shape[0]), 0)
                )

            cfg_ref = plume_config(
                use_pallas=jax.default_backend() != "cpu",
                line_trace=False, jacobi_iter=100,
            )

            @jax.jit
            def _ref_height():
                def body(s, _):
                    return simulate_step(cfg_ref, s), None
                s, _ = jax.lax.scan(body, eval_state0, None, length=400)
                return plume_height(s)

            h_ref = float(_ref_height())
            print(f"evalSelect: Jacobi-100 reference height {h_ref:.0f}",
                  flush=True)

            @jax.jit
            def eval_rollout(params):
                project = lambda p, U, f, r: model.apply(params, p, U, f, r)

                def body(s, _):
                    return simulate_step(cfg_eval, s, project_fn=project), None

                s, _ = jax.lax.scan(
                    body, eval_state0, None, length=400
                )
                div = _ops.velocity_divergence(s.U, s.flags)
                mean_div = jnp.sum(jnp.abs(div) * fl_mask) / jnp.sum(fl_mask)
                rel_h = jnp.abs(plume_height(s) - h_ref) / h_ref
                return mean_div + 0.05 * rel_h
        t0 = time.time()
        window = []
        for i in range(CHUNK, args.onDevice + 1, CHUNK):
            key, sub = jax.random.split(key)
            ts, terms = step(ts, sub, *extra)
            window.append(terms)
            if i % 50 == 0 or i >= args.onDevice:
                mean = jax.tree_util.tree_map(
                    lambda *xs: float(np.mean([np.asarray(x) for x in xs])),
                    *window,
                )
                window = []
                log.append(i, mean)
                log.save()
                if eval_rollout is not None:
                    metric = float(eval_rollout(ts.params))
                else:
                    metric = mean.total
                is_best = metric < best
                best = min(best, metric)
                save_train_checkpoint(
                    args.modelDir, ts, i, best, mcfg, is_best=is_best
                )
                print(
                    f"step {i}/{args.onDevice}: loss {mean.total:.5f} "
                    f"(divL2 {mean.div_l2:.5f} divLT {mean.div_lt:.5f}) "
                    f"metric {metric:.6f}{' *best*' if is_best else ''} "
                    f"{50/(time.time()-t0):.2f} steps/s",
                    flush=True,
                )
                t0 = time.time()
        return

    data_dir = args.dataDir or os.path.join(args.modelDir, "data")
    if args.synthetic:
        print(f"generating {args.synthetic} synthetic scenes...")
        write_synthetic_dataset(
            os.path.join(data_dir, "tr"), args.synthetic,
            steps_per_scene=8, h=args.res, w=args.res,
        )
        write_synthetic_dataset(
            os.path.join(data_dir, "te"), max(args.synthetic // 4, 1),
            steps_per_scene=8, h=args.res, w=args.res, seed=999,
        )
    tr = FluidDataset(data_dir, "tr")
    te = FluidDataset(data_dir, "te")
    steps_per_epoch = len(tr) // tc.batch_size
    print(f"train {len(tr)} frames, val {len(te)} frames, "
          f"{steps_per_epoch} steps/epoch")

    model = FluidNet(mcfg)
    opt = make_optimizer(tc, steps_per_epoch)
    ts = init_train_state(
        model, jax.random.PRNGKey(0), tc, tr.h, tr.w, opt
    )
    epoch0, best = 0, float("inf")
    if args.resume:
        ts, epoch0, best = load_train_checkpoint(args.modelDir, ts)
        print(f"resumed at epoch {epoch0}, best {best:.5f}")

    train_step, eval_step = make_train_step(model, scfg, tc, opt)
    train_step = jax.jit(train_step, donate_argnums=0)
    eval_step = jax.jit(eval_step)

    os.makedirs(args.modelDir, exist_ok=True)
    tr_log = LossLogger(os.path.join(args.modelDir, "train_loss.npy"))
    va_log = LossLogger(os.path.join(args.modelDir, "val_loss.npy"))
    key = jax.random.PRNGKey(1234)

    for epoch in range(epoch0 + 1, tc.max_epochs + 1):
        t0 = time.time()
        tr_terms = []
        for batch in tr.batches(tc.batch_size, shuffle=True, seed=epoch):
            key, sub = jax.random.split(key)
            ts, terms = train_step(ts, sample_to_batch(batch), sub)
            tr_terms.append(terms)
        va_terms = []
        for batch in te.batches(tc.batch_size, shuffle=False,
                                drop_last=False):
            key, sub = jax.random.split(key)
            va_terms.append(eval_step(ts, sample_to_batch(batch), sub))

        def mean_terms(terms_list):
            import jax.numpy as jnp

            return jax.tree_util.tree_map(
                lambda *xs: float(np.mean([np.asarray(x) for x in xs])),
                *terms_list,
            )

        trm = mean_terms(tr_terms)
        vam = mean_terms(va_terms)
        tr_log.append(epoch, trm)
        va_log.append(epoch, vam)
        tr_log.save()
        va_log.save()

        is_best = vam.total < best
        best = min(best, vam.total)
        save_train_checkpoint(
            args.modelDir, ts, epoch, best, mcfg, is_best=is_best
        )
        print(
            f"epoch {epoch}/{tc.max_epochs}: train {trm.total:.5f} "
            f"val {vam.total:.5f}{' *best*' if is_best else ''} "
            f"({time.time()-t0:.1f}s)"
        )


if __name__ == "__main__":
    main()
