"""Simulation run loop shared by the scene drivers.

Replaces the reference's per-scene while-loops (ref: plume.py:232-426,
rayleighTaylor.py, cylinder.py) with a scan-chunked driver: ``stat_iter``
steps are fused into one jitted ``lax.scan`` between host-side outputs, so
the device never waits on Python between stats intervals.
"""
import os
import time
from typing import Callable, Optional

import jax

from ..config import SimConfig
from ..state import SimState
from .step import simulate_step


def make_chunk_runner(cfg: SimConfig, project_fn=None, chunk: int = 1):
    """jitted fn advancing the state ``chunk`` steps via lax.scan."""

    def body(state, _):
        return simulate_step(cfg, state, project_fn=project_fn), None

    @jax.jit
    def run(state):
        state, _ = jax.lax.scan(body, state, None, length=chunk)
        return state

    return run


def run_simulation(
    cfg: SimConfig,
    state: SimState,
    max_iter: int,
    stat_iter: int = 100,
    project_fn=None,
    on_stats: Optional[Callable] = None,
    start_it: int = 0,
    verbose: bool = True,
):
    """Advance to ``max_iter`` steps, invoking ``on_stats(state, it)`` every
    ``stat_iter`` steps. Returns the final state."""
    runner = make_chunk_runner(cfg, project_fn, chunk=stat_iter)
    single = make_chunk_runner(cfg, project_fn, chunk=1)

    # Runtime CFL guard (VERDICT r2 item 6): the window engines clamp
    # back-traces to +-max_disp cells; detect and report actual violations
    # instead of silently clamping. Checked once per stats interval (one
    # device reduce) — displacement drifts over many steps, not within one.
    guard = cfg.advection_impl == "window"
    if guard:
        from ..ops.window import max_displacement

        max_disp_fn = jax.jit(lambda s: max_displacement(s.U, cfg.dt))
        eff_disp = cfg.max_disp
    warned_cfl = False

    it = start_it
    # Align to the stats grid if restarting mid-interval.
    while it % stat_iter != 0 and it < max_iter:
        state = single(state)
        it += 1

    t0 = time.perf_counter()
    while it < max_iter:
        n = min(stat_iter, max_iter - it)
        if n == stat_iter:
            state = runner(state)
        else:
            for _ in range(n):
                state = single(state)
        it += n
        jax.block_until_ready(state.U)
        if verbose:
            rate = n / max(time.perf_counter() - t0, 1e-9)
            print(f"it={it}/{max_iter}  {rate:.1f} steps/s", flush=True)
        if guard:
            d = float(max_disp_fn(state))
            if d > eff_disp and not warned_cfl:
                import warnings

                warnings.warn(
                    f"CFL violation at it={it}: max back-trace displacement "
                    f"{d:.2f} cells exceeds the window bound max_disp="
                    f"{eff_disp}; advection is clamping trajectories. "
                    f"Reduce dt or switch advection_impl='gather'.",
                    stacklevel=2,
                )
                warned_cfl = True
        if on_stats is not None:
            on_stats(state, it)
        t0 = time.perf_counter()
    return state
