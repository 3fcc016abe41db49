#!/usr/bin/env python3
"""Train the learned coarse-grid correction for mg_learned projections.

    python scripts/train_mg_coarse.py --res 512 --frames 256 --steps 2000 \
        --modelDir trained_models/MGCoarse_128

Data: the EXACT inference distribution — pre-projection divergence fields
from a plume rollout under converged multigrid (plus synthetic
random-obstacle fields for geometry diversity), pushed down the V-cycle's
pre-smooth/restrict leg to the 128^2 cut (ops.multigrid.mg_cut_rhs).
Labels: the converged coarse solve (8 V-cycles at the cut level).
Eval: post-projection |div| of a held-out fine-level frame set under the
full mg_learned 1-V-cycle vs plain MG-1v / MG-2v — the metric the
quality-per-ms table grades.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def collect_buffer(res, n_frames, stride, warmup, synth_frac, seed=0):
    """Returns host arrays (flags_c, rhs_c) of shape (N, hc, wc) plus the
    held-out FINE eval fields (flags, U_pre) for end-metric eval."""
    import jax
    import jax.numpy as jnp

    from fluidnet_cxx_tpu import ops
    from fluidnet_cxx_tpu.data.synthetic import (
        _gaussian_bumps,
        _random_obstacles,
        _smooth_noise,
    )
    from fluidnet_cxx_tpu.ops.multigrid import mg_cut_rhs
    from fluidnet_cxx_tpu.ops.stencils import set_wall_bcs
    from fluidnet_cxx_tpu.sim import (
        apply_const_vals,
        create_plume_scene,
        plume_config,
        simulate_step,
    )

    cfg = plume_config(
        sim_method="multigrid", mg_vcycles=2,
        use_pallas=jax.default_backend() != "cpu", line_trace=False,
    )
    state = create_plume_scene(res, res, density_val=0.1,
                               u_scale=8.0 * res / 512.0, rad=0.145)

    @jax.jit
    def advance(s):
        def body(c, _):
            return simulate_step(cfg, c), None

        s, _ = jax.lax.scan(body, s, None, length=stride)
        d = simulate_step(cfg, s, output_div=True)
        # Replicate the step's pre-projection conditioning
        # (sim/step.py:249-250) so rhs matches inference exactly.
        U = set_wall_bcs(d.U, d.flags)
        U, _ = apply_const_vals(d, U, d.density)
        div = ops.velocity_divergence(U, d.flags)
        fc, rc = mg_cut_rhs(d.flags, div)
        return simulate_step(cfg, s), fc, rc, U

    @jax.jit
    def warm(s):
        def body(c, _):
            return simulate_step(cfg, c), None

        return jax.lax.scan(body, s, None, length=warmup)[0]

    state = warm(state)
    flags_cs, rhs_cs, eval_fine = [], [], []
    n_plume = int(n_frames * (1 - synth_frac))
    t0 = time.time()
    for i in range(n_plume):
        state, fc, rc, U_pre = advance(state)
        flags_cs.append(np.asarray(fc[0]))
        rhs_cs.append(np.asarray(rc[0]))
        if i % max(n_plume // 8, 1) == 0:
            eval_fine.append((np.asarray(state.flags), np.asarray(U_pre)))
            print(f"  plume frame {i}/{n_plume} "
                  f"({time.time()-t0:.0f}s)", flush=True)

    # Synthetic random-obstacle fields at FINE res -> same downward leg.
    n_synth = n_frames - n_plume
    key = jax.random.PRNGKey(seed + 77)

    @jax.jit
    def synth(key):
        ks = jax.random.split(key, 5)
        u = (_smooth_noise(ks[0], 1, res, res) * 3.0
             + _gaussian_bumps(ks[1], 1, res, res) * 3.0)
        v = (_smooth_noise(ks[2], 1, res, res) * 3.0
             + _gaussian_bumps(ks[3], 1, res, res) * 3.0)
        U = jnp.stack([u, v], axis=1)
        flags = _random_obstacles(ks[4], 1, res, res)
        U = set_wall_bcs(U, flags)
        div = ops.velocity_divergence(U, flags)
        fc, rc = mg_cut_rhs(flags, div)
        return fc, rc, flags, U

    for i in range(n_synth):
        key, sub = jax.random.split(key)
        fc, rc, flags_f, U_f = synth(sub)
        flags_cs.append(np.asarray(fc[0]))
        rhs_cs.append(np.asarray(rc[0]))
        if i % max(n_synth // 3, 1) == 0:
            eval_fine.append((np.asarray(flags_f), np.asarray(U_f)))
    print(f"buffer: {len(rhs_cs)} coarse problems, "
          f"{len(eval_fine)} fine eval frames ({time.time()-t0:.0f}s)",
          flush=True)
    return (np.stack(flags_cs), np.stack(rhs_cs), eval_fine)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--stride", type=int, default=2)
    ap.add_argument("--warmup", type=int, default=50)
    ap.add_argument("--synthFrac", type=float, default=0.3)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--bsz", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--labelCycles", type=int, default=8)
    ap.add_argument("--coarseSize", type=int, default=128)
    ap.add_argument("--modelDir", default="trained_models/MGCoarse_128")
    ap.add_argument("--evalEvery", type=int, default=250)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from fluidnet_cxx_tpu import ops
    from fluidnet_cxx_tpu.models.mg_coarse import (
        MGCoarseConfig,
        MGCoarseNet,
        _cont,
        init_mg_coarse_params,
        make_project_fn_mg_learned,
        save_mg_coarse,
    )
    from fluidnet_cxx_tpu.ops.multigrid import solve_mg
    from fluidnet_cxx_tpu.ops.stencils import (
        set_wall_bcs,
        velocity_update,
    )

    flags_c, rhs_c, eval_fine = collect_buffer(
        args.res, args.frames, args.stride, args.warmup, args.synthFrac)
    hc, wc = rhs_c.shape[1:]
    print(f"coarse problems at {hc}x{wc}")

    # Converged labels, batched once.
    @jax.jit
    def label(fc, rc):
        return solve_mg(fc, rc, n_vcycles=args.labelCycles)

    labels = []
    B = 16
    for i in range(0, len(rhs_c), B):
        labels.append(np.asarray(label(
            jnp.asarray(flags_c[i:i + B]), jnp.asarray(rhs_c[i:i + B]))))
    labels = np.concatenate(labels)
    print("labels done", flush=True)

    cfg = MGCoarseConfig()
    model = MGCoarseNet(cfg)
    params = init_mg_coarse_params(model, jax.random.PRNGKey(0), hc, wc)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"MGCoarseNet params: {n_params/1e3:.1f}k")
    sched = optax.cosine_decay_schedule(args.lr, args.steps, 0.05)
    opt = optax.adam(sched)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, fc, rc, e_star):
        def loss_fn(p):
            e = model.apply(p, fc, rc)
            cont = _cont(fc)
            num = jnp.sum((e - e_star) ** 2 * cont, axis=(1, 2))
            den = jnp.sum(e_star**2 * cont, axis=(1, 2)) + 1e-12
            return jnp.mean(num / den)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state, loss

    def eval_params(params):
        """Post-projection max/mean |div| on held-out fine frames under the
        full mg_learned 1-cycle, vs plain MG-1v / MG-2v."""
        project = make_project_fn_mg_learned(
            model, params, coarse_size=args.coarseSize)
        rows = {"learned1v": [], "mg1v": [], "mg2v": []}
        for flags_f, U_f in eval_fine:
            flags_f = jnp.asarray(flags_f)
            U_f = jnp.asarray(U_f)
            fl = flags_f == 1
            _, U_l = project(None, U_f, flags_f, None)
            rows["learned1v"].append(ops.velocity_divergence(U_l, flags_f))
            for name, nv in (("mg1v", 1), ("mg2v", 2)):
                p = solve_mg(flags_f, ops.velocity_divergence(U_f, flags_f),
                             n_vcycles=nv)
                U_p = set_wall_bcs(velocity_update(p, U_f, flags_f), flags_f)
                rows[name].append(ops.velocity_divergence(U_p, flags_f))
        out = {}
        for name, divs in rows.items():
            d = jnp.abs(jnp.concatenate(divs))
            m = jnp.concatenate([jnp.asarray(f) == 1 for f, _ in eval_fine])
            out[name] = (float(jnp.where(m, d, 0).max()),
                         float(jnp.sum(d * m) / jnp.sum(m)))
        return out

    rng = np.random.default_rng(0)
    best = float("inf")
    t0 = time.time()
    for step in range(1, args.steps + 1):
        idx = rng.integers(0, len(rhs_c), args.bsz)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(flags_c[idx]),
            jnp.asarray(rhs_c[idx]), jnp.asarray(labels[idx]))
        if step % args.evalEvery == 0 or step == args.steps:
            ev = eval_params(params)
            metric = ev["learned1v"][1]
            is_best = metric < best
            best = min(best, metric)
            save_mg_coarse(args.modelDir, cfg, params, step, best,
                           is_best=is_best)
            print(
                f"step {step}: loss {float(loss):.4f} | post-proj div "
                f"(max/mean) learned1v {ev['learned1v'][0]:.4f}/"
                f"{ev['learned1v'][1]:.6f}  mg1v {ev['mg1v'][0]:.4f}/"
                f"{ev['mg1v'][1]:.6f}  mg2v {ev['mg2v'][0]:.4f}/"
                f"{ev['mg2v'][1]:.6f}"
                f"{' *best*' if is_best else ''} "
                f"({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
