"""Bounded-window sampling engine == gather engine for CFL-safe fields."""
import numpy as np
import pytest

from conftest import random_flags
from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.ops import window as win

B, H, W = 1, 20, 24
D = 4


@pytest.fixture
def fields(rng):
    flags = random_flags(rng, B, H, W, p_obstacle=0.12)
    # velocities giving |disp| well under D cells
    U = (2.0 * rng.standard_normal((B, 2, H, W))).astype(np.float32)
    rho = rng.random((B, H, W)).astype(np.float32)
    pos = np.zeros((B, 2, H, W), np.float32)
    xx = np.arange(W, dtype=np.float32) + 0.5
    yy = np.arange(H, dtype=np.float32)[:, None] + 0.5
    pos[:, 0] = xx + rng.uniform(-3.5, 3.5, (B, H, W))
    pos[:, 1] = yy + rng.uniform(-3.5, 3.5, (B, H, W))
    return flags, U, rho, pos.astype(np.float32)


def test_interpol_window_matches_gather(fields):
    flags, _, rho, pos = fields
    got = np.asarray(win.interpol_window(rho, pos, D))
    want = np.asarray(ops.interpol(rho, pos))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_interpol_with_fluid_window_matches_gather(fields):
    flags, _, rho, pos = fields
    got = np.asarray(win.interpol_with_fluid_window(rho, flags, pos, D))
    want = np.asarray(ops.interpol_with_fluid(rho, flags, pos))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("sample_outside", [False, True])
def test_advect_scalar_window_matches_gather(fields, sample_outside):
    flags, U, rho, _ = fields
    kw = dict(
        sample_outside_fluid=sample_outside, maccormack_strength=0.6
    )
    got = np.asarray(
        ops.advect_scalar(0.4, rho, U, flags, impl="window", max_disp=D, **kw)
    )
    want = np.asarray(ops.advect_scalar(0.4, rho, U, flags, impl="gather", **kw))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_advect_velocity_window_matches_gather(fields):
    flags, U, _, _ = fields
    got = np.asarray(
        ops.advect_velocity(
            0.3, U, U, flags, impl="window", max_disp=D,
            maccormack_strength=0.6,
        )
    )
    want = np.asarray(
        ops.advect_velocity(0.3, U, U, flags, maccormack_strength=0.6)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_window_clamps_super_cfl(rng):
    """Beyond the window the displacement is clamped — result stays finite
    and bounded by the source range (documented divergence from gather)."""
    flags = random_flags(rng, 1, 16, 16, p_obstacle=0.0)
    U = np.full((1, 2, 16, 16), 30.0, np.float32)  # 30 cells/step
    rho = rng.random((1, 16, 16)).astype(np.float32)
    out = np.asarray(
        ops.advect_scalar(1.0, rho, U, flags, impl="window", max_disp=3)
    )
    assert np.isfinite(out).all()
    assert out.max() <= rho.max() + 1e-5


def test_full_step_window_matches_gather():
    import jax

    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    state = create_plume_scene(32, 32, u_scale=1.0, rad=0.2)
    out = {}
    for impl in ("window", "gather"):
        cfg = plume_config(jacobi_iter=30).replace(advection_impl=impl)
        s = state
        step = jax.jit(lambda s, cfg=cfg: simulate_step(cfg, s))
        for _ in range(6):
            s = step(s)
        out[impl] = s
    np.testing.assert_allclose(
        np.asarray(out["window"].density),
        np.asarray(out["gather"].density),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["window"].U), np.asarray(out["gather"].U), atol=1e-5
    )


def test_cfl_guard_reports_violation():
    """run_simulation warns when the actual back-trace displacement exceeds
    the window bound instead of silently clamping (VERDICT r2 item 6)."""
    import warnings

    import jax.numpy as jnp

    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config
    from fluidnet_cxx_tpu.sim.driver import run_simulation
    from fluidnet_cxx_tpu.ops.window import max_displacement

    state = create_plume_scene(32, 32, u_scale=1.0, rad=0.2)
    # super-CFL velocity: 12 cells/step with max_disp=4
    state = state._replace(U=jnp.ones_like(state.U) * 12.0)
    assert float(max_displacement(state.U, 1.0)) > 4.0

    cfg = plume_config(dt=1.0, jacobi_iter=4, line_trace=False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        run_simulation(cfg, state, max_iter=2, stat_iter=2, verbose=False)
    assert any("CFL violation" in str(w.message) for w in rec), (
        [str(w.message) for w in rec])
