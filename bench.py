"""Headline benchmark: 2-D plume at 512x512 with the learned projection.

Prints ONE JSON line:
  {"metric": "plume_512_cnn_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R, ...extra diagnostic fields...}

``vs_baseline`` is measured steps/s divided by the driver target of
50x a CPU reference (BASELINE.json north star). The CPU reference proxy is
this framework's own step on the host CPU backend (the PyTorch reference
cannot run here — it is CUDA-only at 512^2); override with env
BENCH_CPU_REF_SPS if a measured torch number is available.

The learned projection is the SHIPPED trained flagship checkpoint
(env BENCH_MODEL_DIR, default trained_models/PUNetD2_128), so the headline
throughput and the quality diagnostics come from the same artifact
(VERDICT r1 item 10). Falls back to an untrained net if the checkpoint is
missing.

Methodology: marginal steps/s — time jitted scans of n and 4n steps on
already-compiled invocations with chained inputs and difference them; the
axon remote executor adds a fixed ~45 ms per invocation which single-N
timing would smear over every step. MFU is XLA's cost_analysis FLOP count
for the projection forward divided by measured projection time and the v5e
bf16 peak (197 TFLOP/s).

Extra diagnostics (Jacobi variants, divergence, 128^2 table) go to stderr.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

MODEL_DIR = os.environ.get("BENCH_MODEL_DIR", "trained_models/PUNetD2_128")
V5E_PEAK_FLOPS = 197e12  # bf16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_flagship(res):
    """(project_fn, info) from the shipped checkpoint; untrained fallback."""
    import dataclasses

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models import FluidNet, init_params, make_project_fn

    use_pallas = jax.default_backend() != "cpu"
    try:
        from fluidnet_cxx_tpu.train import TrainConfig, init_train_state
        from fluidnet_cxx_tpu.train.checkpoint import (
            load_model_config,
            load_train_checkpoint,
        )

        mcfg = load_model_config(MODEL_DIR)
        if use_pallas and mcfg.polish_sweeps > 0:
            mcfg = dataclasses.replace(mcfg, polish_impl="pallas")
        model = FluidNet(mcfg)
        template = init_train_state(
            model, jax.random.PRNGKey(0), TrainConfig(), res, res
        )
        ts, _, _ = load_train_checkpoint(MODEL_DIR, template, best=True)
        params = ts.params
        info = f"{mcfg.model} ({MODEL_DIR}, polish={mcfg.polish_sweeps})"
    except Exception as e:
        log(f"checkpoint load failed ({e}); using untrained ScaleNet")
        mcfg = ModelConfig(model="ScaleNet")
        model = FluidNet(mcfg)
        params = init_params(model, jax.random.PRNGKey(0), res, res)
        info = "ScaleNet (untrained fallback)"
    return model, params, make_project_fn(model, params), info


def build(res, sim_method="convnet", jacobi_iter=200, fast=True,
          project=None):
    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    cfg = plume_config(sim_method=sim_method, jacobi_iter=jacobi_iter, dt=0.1)
    if fast:
        # Fused Pallas kernels + no line trace. The trace is numerically
        # inert for the obstacle-free plume (verified < 3e-7 over 20 steps)
        # and the Pallas path is bit-exact vs the XLA window path.
        cfg = cfg.replace(use_pallas=jax.default_backend() != "cpu",
                          line_trace=False)
    # plumeConfig.yaml scene: injectionDensity .1, velocity 2 (scaled by
    # res/128 like solver_cpp/simulate/simulate.cpp:253), radius .145.
    state = create_plume_scene(
        res, res, density_val=0.1, u_scale=2.0 * res / 128.0, rad=0.145
    )

    def step(s):
        return simulate_step(cfg, s, project_fn=project)

    return step, state


def time_steps(step, state, n_steps):
    """Marginal steps/s: time scans of n and 4n steps and difference them."""
    def make(n):
        @jax.jit
        def run(s):
            return jax.lax.scan(
                lambda c, _: (step(c), None), s, None, length=n
            )[0]
        return run

    run_a, run_b = make(n_steps), make(4 * n_steps)

    s = run_a(state)
    _ = float(jnp.sum(s.density))  # compile + warm run, forced to host
    t0 = time.perf_counter()
    s = run_a(s)  # chained input: cannot be served from cache
    _ = float(jnp.sum(s.density))
    t_a = time.perf_counter() - t0

    s = run_b(s)
    _ = float(jnp.sum(s.density))  # compile + warm
    t0 = time.perf_counter()
    s = run_b(s)
    _ = float(jnp.sum(s.density))
    t_b = time.perf_counter() - t0

    dt = max(t_b - t_a, 1e-9) / (3 * n_steps)
    return 1.0 / dt, s


def div_stats(state):
    from fluidnet_cxx_tpu import ops

    div = ops.velocity_divergence(state.U, state.flags)
    fl = (state.flags == 1) & (state.U_bc_inv_mask[:, 1] > 0.5)
    mean = float(jnp.sum(jnp.abs(div) * fl) / jnp.sum(fl))
    mx = float(jnp.max(jnp.abs(div) * fl))
    return mean, mx


def projection_mfu(model, params, res, n=50):
    """MFU of the learned projection forward: XLA-counted FLOPs / measured
    marginal time / v5e bf16 peak."""
    p = jnp.zeros((1, res, res), jnp.float32)
    U = jnp.ones((1, 2, res, res), jnp.float32)
    flags = jnp.ones((1, res, res), jnp.int32)
    rho = jnp.zeros((1, res, res), jnp.float32)

    def fwd(p, U):
        return model.apply(params, p, U, flags, rho)

    try:
        comp = jax.jit(fwd).lower(p, U).compile()
        flops = float(comp.cost_analysis()["flops"])
    except Exception:
        flops = 0.0

    def make(k):
        @jax.jit
        def run(p, U):
            def body(c, _):
                pp, uu = c
                pp2, uu2 = fwd(pp, uu)
                return (pp2, uu2 * (1.0 - 1e-7)), None
            return jax.lax.scan(body, (p, U), None, length=k)[0]
        return run

    ra, rb = make(n), make(4 * n)
    out = ra(p, U)
    _ = float(jnp.sum(out[0]))
    t0 = time.perf_counter()
    out = ra(*out)
    _ = float(jnp.sum(out[0]))
    ta = time.perf_counter() - t0
    out2 = rb(*out)
    _ = float(jnp.sum(out2[0]))
    t0 = time.perf_counter()
    out2 = rb(*out2)
    _ = float(jnp.sum(out2[0]))
    tb = time.perf_counter() - t0
    t_step = max(tb - ta, 1e-9) / (3 * n)
    mfu = flops / t_step / V5E_PEAK_FLOPS if flops else 0.0
    return mfu, flops, t_step


def main():
    res = int(os.environ.get("BENCH_RES", "512"))
    n_steps = int(os.environ.get("BENCH_STEPS", "100"))

    dev = jax.devices()[0]
    log(f"device: {dev} | benchmarking plume {res}^2, scan of {n_steps}")

    model, params, project, info = load_flagship(res)
    log(f"flagship projection: {info}")

    sps, state = time_steps(*build(res, "convnet", project=project), n_steps)
    mean_div, max_div = div_stats(state)
    log(f"CNN projection (fused pallas): {sps:.2f} steps/s at {res}^2 | "
        f"mean|div|={mean_div:.5f} max|div|={max_div:.4f}")

    mfu, flops, t_proj = projection_mfu(model, params, res)
    log(f"projection forward: {1e3 * t_proj:.3f} ms, {flops / 1e9:.2f} "
        f"GFLOP -> MFU {100 * mfu:.1f}% of v5e bf16 peak")

    extra = {
        "model": info,
        "mean_div": round(mean_div, 6),
        "max_div": round(max_div, 5),
        "proj_ms": round(1e3 * t_proj, 4),
        "proj_mfu": round(mfu, 4),
    }

    jac = {}
    try:
        from fluidnet_cxx_tpu import ops  # noqa: F401

        for ji in (28, 100, 200):
            spsj, statej = time_steps(
                *build(res, "jacobi", jacobi_iter=ji), n_steps
            )
            mj, xj = div_stats(statej)
            jac[f"jacobi{ji}_sps"] = round(spsj, 1)
            log(
                f"Jacobi-{ji}: {spsj:.2f} steps/s at {res}^2, "
                f"mean|div|={mj:.5f} max|div|={xj:.5f}"
            )
    except Exception as e:  # diagnostics only
        log("jacobi diagnostics failed:", e)
    extra.update(jac)

    try:
        t128 = {}
        proj128 = load_flagship(128)[2]
        s128, _ = time_steps(*build(128, "convnet", project=proj128), 200)
        t128["cnn_sps"] = round(s128, 1)
        for ji in (28, 100):
            sj, _ = time_steps(*build(128, "jacobi", jacobi_iter=ji), 200)
            t128[f"jacobi{ji}_sps"] = round(sj, 1)
        log(f"128^2 table: {t128}")
        extra["table_128"] = t128
    except Exception as e:
        log("128^2 table failed:", e)

    # CPU reference: measured once on this host (gather-mode convnet step,
    # 512^2, jax CPU backend, 1 core) = 0.583 steps/s; the torch reference
    # itself is CUDA-only at this size. Re-measure with BENCH_MEASURE_CPU=1
    # or override with BENCH_CPU_REF_SPS.
    cpu_sps = float(os.environ.get("BENCH_CPU_REF_SPS", "0.583"))
    if os.environ.get("BENCH_MEASURE_CPU") == "1":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                cpu_sps, _ = time_steps(
                    *build(res, "convnet", project=project, fast=False), 3
                )
            log(f"CPU proxy: {cpu_sps:.3f} steps/s")
        except Exception as e:
            log("CPU proxy failed:", e)

    vs = (sps / (50.0 * cpu_sps)) if cpu_sps else None
    out = {
        "metric": f"plume_{res}_cnn_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs is not None else None,
    }
    out.update(extra)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
