"""Headline benchmark: 2-D plume at 512x512 with CNN (ScaleNet) projection.

Prints ONE JSON line:
  {"metric": "plume_512_cnn_steps_per_sec", "value": N, "unit": "steps/s",
   "vs_baseline": R}

``vs_baseline`` is measured steps/s divided by the driver target of
50x a CPU reference (BASELINE.json north star). The CPU reference proxy is
this framework's own step on the host CPU backend (the PyTorch reference
cannot run here — it is CUDA-only at 512^2); override with env
BENCH_CPU_REF_SPS if a measured torch number is available.

Methodology: N steps fused into one jitted lax.scan; timed on the second,
already-compiled invocation with a chained (different) input, ending in a
single host materialisation. (The axon remote backend memoizes identical
calls and its block_until_ready is unreliable — per-step host pulls or
repeated identical inputs both give bogus numbers.)

Extra diagnostics (Jacobi variants, divergence) go to stderr.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build(res, sim_method="convnet", jacobi_iter=200, fast=True,
          compute_dtype="float32"):
    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models import FluidNet, init_params, make_project_fn
    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    cfg = plume_config(sim_method=sim_method, jacobi_iter=jacobi_iter, dt=0.1)
    if fast:
        # Fused Pallas kernels + no line trace. The trace is numerically
        # inert for the obstacle-free plume (verified < 3e-7 over 20 steps)
        # and the Pallas path is bit-exact vs the XLA window path.
        cfg = cfg.replace(use_pallas=True, line_trace=False)
    # plumeConfig.yaml scene: injectionDensity .1, velocity 2 (scaled by
    # res/128 like solver_cpp/simulate/simulate.cpp:253), radius .145.
    state = create_plume_scene(
        res, res, density_val=0.1, u_scale=2.0 * res / 128.0, rad=0.145
    )
    if sim_method == "convnet":
        model = FluidNet(ModelConfig(model="ScaleNet",
                                     compute_dtype=compute_dtype))
        params = init_params(model, jax.random.PRNGKey(0), res, res)
        project = make_project_fn(model, params)
    else:
        project = None

    def step(s):
        return simulate_step(cfg, s, project_fn=project)

    return step, state


def time_steps(step, state, n_steps):
    """Marginal steps/s: time scans of n and 4n steps and difference them.

    The axon executor adds a FIXED ~45 ms per jitted invocation (RPC +
    host pull); a single-N timing inflates every step by overhead/N. The
    marginal rate (t(4n)-t(n))/(3n) cancels the fixed term and reports the
    true on-device step time (measured r2: the fixed term is flat in N).
    """
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


def main():
    res = int(os.environ.get("BENCH_RES", "512"))
    n_steps = int(os.environ.get("BENCH_STEPS", "100"))

    dev = jax.devices()[0]
    log(f"device: {dev} | benchmarking plume {res}^2, scan of {n_steps}")

    sps, state = time_steps(*build(res, "convnet"), n_steps)
    log(f"CNN projection (fused pallas): {sps:.2f} steps/s at {res}^2")
    try:
        sps_ref, _ = time_steps(
            *build(res, "convnet", fast=False), n_steps
        )
        log(f"CNN projection (parity-default XLA+trace): {sps_ref:.2f} steps/s")
        sps_bf16, _ = time_steps(
            *build(res, "convnet", compute_dtype="bfloat16"), n_steps
        )
        log(f"CNN projection (pallas + bf16 convs): {sps_bf16:.2f} steps/s")
    except Exception as e:
        log("variant diagnostics failed:", e)

    from fluidnet_cxx_tpu import ops

    div = jnp.abs(ops.velocity_divergence(state.U, state.flags)).max()
    log(f"max |div| after CNN step (untrained net): {float(div):.4f}")

    try:
        for ji in (28, 100, 200):
            spsj, statej = time_steps(
                *build(res, "jacobi", jacobi_iter=ji), n_steps
            )
            divj = jnp.abs(
                ops.velocity_divergence(statej.U, statej.flags)
            ).max()
            log(
                f"Jacobi-{ji}: {spsj:.2f} steps/s at {res}^2, "
                f"max|div|={float(divj):.5f}"
            )
    except Exception as e:  # diagnostics only
        log("jacobi diagnostics failed:", e)

    # CPU reference: measured once on this host (gather-mode convnet step,
    # 512^2, jax CPU backend, 1 core) = 0.583 steps/s; the torch reference
    # itself is CUDA-only at this size. Re-measure with BENCH_MEASURE_CPU=1
    # or override with BENCH_CPU_REF_SPS.
    cpu_sps = float(os.environ.get("BENCH_CPU_REF_SPS", "0.583"))
    if os.environ.get("BENCH_MEASURE_CPU") == "1":
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                cpu_sps, _ = time_steps(*build(res, "convnet"), 3)
            log(f"CPU proxy: {cpu_sps:.3f} steps/s")
        except Exception as e:
            log("CPU proxy failed:", e)

    vs = (sps / (50.0 * cpu_sps)) if cpu_sps else None
    print(
        json.dumps(
            {
                "metric": f"plume_{res}_cnn_steps_per_sec",
                "value": round(sps, 3),
                "unit": "steps/s",
                "vs_baseline": round(vs, 3) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
