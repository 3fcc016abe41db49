"""End-to-end simulation step: plume with Jacobi projection.

Property tests in the spirit of the reference's golden harness
(ref: solver_cpp/test/test_fluid.cpp:412-441): post-projection divergence is
small, density stays bounded, flags are untouched, the plume rises.
"""
import jax
import numpy as np

from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.sim import (
    create_plume_scene,
    create_rayleigh_taylor_scene,
    plume_config,
    rayleigh_taylor_config,
    simulate_step,
)


def run_steps(cfg, state, n):
    step = jax.jit(lambda s: simulate_step(cfg, s))
    for _ in range(n):
        state = step(state)
    return state


def test_plume_steps_and_projects():
    cfg = plume_config(jacobi_iter=60)
    state = create_plume_scene(32, 32, density_val=1.0, u_scale=1.0, rad=0.2)
    flags0 = np.asarray(state.flags).copy()
    state = run_steps(cfg, state, 8)

    assert np.isfinite(np.asarray(state.U)).all()
    assert np.isfinite(np.asarray(state.density)).all()
    # flags invariant (ref harness checks the same)
    np.testing.assert_array_equal(np.asarray(state.flags), flags0)
    # density is advected, stays within [0, 1] up to clamp tolerance
    rho = np.asarray(state.density)
    assert rho.max() <= 1.0 + 1e-4 and rho.min() >= -1e-4
    # plume has risen: density present above the inlet rows
    assert rho[0, 5:12, :].max() > 1e-4
    # post-projection divergence is small relative to pre-projection
    div = np.asarray(ops.velocity_divergence(state.U, state.flags))
    assert np.abs(div).max() < 0.2


def test_plume_divergence_shrinks_with_iters():
    state = create_plume_scene(32, 32)
    d = []
    for iters in (10, 200):
        s = run_steps(plume_config(jacobi_iter=iters), state, 5)
        div = np.asarray(ops.velocity_divergence(s.U, s.flags))
        d.append(np.abs(div).max())
    assert d[1] < d[0]


def test_rayleigh_taylor_steps():
    cfg = rayleigh_taylor_config(jacobi_iter=40)
    state = create_rayleigh_taylor_scene(16, 64)
    rho0 = np.asarray(state.density)
    state = run_steps(cfg, state, 4)
    rho = np.asarray(state.density)
    assert np.isfinite(rho).all()
    # mean density approximately conserved (ref: rayleighTaylor.py:276-281)
    assert abs(rho.mean() - rho0.mean()) < 5e-3


def test_step_is_jit_scan_compatible():
    """Whole-step under lax.scan (rollout pattern for training)."""
    cfg = plume_config(jacobi_iter=20)
    state = create_plume_scene(16, 16)

    def body(s, _):
        return simulate_step(cfg, s), None

    final, _ = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=3)
    )(state)
    assert np.isfinite(np.asarray(final.U)).all()
