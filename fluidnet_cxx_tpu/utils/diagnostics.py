"""Physics diagnostics and performance instrumentation.

Covers the reference's scattered observability (SURVEY.md §5): RT interface
tracking (ref: rayleighTaylor.py:241-258), mean-density conservation
(ref: rayleighTaylor.py:276-281), plus steps/sec counters and jax.profiler
hooks — instrumentation the reference lacks entirely.
"""
import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def rt_interface_distance(density, res_y: int):
    """Rayleigh-Taylor interface position: where the centre-column density
    crosses zero (linear interpolation), relative to mid-height.

    Jit-friendly (fixed shapes). (ref: rayleighTaylor.py:241-258)
    """
    rho = density[0]  # (h, w)
    h, w = rho.shape
    col = rho[:, w // 2]
    sign_change = (col[:-1] < 0) & (col[1:] > 0)
    idx = jnp.argmax(sign_change)  # first crossing
    r1 = col[idx]
    r2 = col[idx + 1]
    m = r1 - r2
    frac = jnp.where(jnp.abs(m) > 1e-12, r1 / m, 0.5)
    return (idx.astype(jnp.float32) + frac) - res_y // 2


def mean_density(density):
    """(ref: rayleighTaylor.py:276-281)"""
    return jnp.mean(density)


def divergence_norms(U, flags):
    from ..ops.stencils import velocity_divergence

    div = velocity_divergence(U, flags)
    return {
        "div_max": jnp.max(jnp.abs(div)),
        "div_l2": jnp.sqrt(jnp.mean(div**2)),
    }


class StepTimer:
    """steps/sec counter with async-dispatch awareness."""

    def __init__(self):
        self.t0 = None
        self.steps = 0

    def start(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n: int = 1):
        self.steps += n

    def rate(self, pending=None):
        if pending is not None:
            jax.block_until_ready(pending)
        dt = time.perf_counter() - self.t0
        return self.steps / dt if dt > 0 else float("inf")


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class LossLogger:
    """Per-epoch loss rows appended to .npy, reference layout
    (7 cols: epoch,total,pL2,divL2,pL1,divL1,divLT;
    ref: fluid_net_train.py:504-515,600-614)."""

    def __init__(self, path: str):
        self.path = path
        self.rows = []
        import os

        if os.path.isfile(path):
            self.rows = list(np.load(path))

    def append(self, epoch: int, terms):
        self.rows.append(
            np.array(
                [
                    epoch,
                    float(terms.total),
                    float(terms.p_l2),
                    float(terms.div_l2),
                    float(terms.p_l1),
                    float(terms.div_l1),
                    float(terms.div_lt),
                ],
                np.float64,
            )
        )

    def save(self):
        np.save(self.path, np.stack(self.rows))
