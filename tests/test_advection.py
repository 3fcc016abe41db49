"""MacCormack advection + line trace vs the scalar-loop oracle."""
import numpy as np
import pytest

from conftest import random_flags
from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.oracle import np_oracle as orc

B, H, W = 1, 18, 22


@pytest.fixture
def fields(rng):
    flags = random_flags(rng, B, H, W, p_obstacle=0.12)
    U = (2.5 * rng.standard_normal((B, 2, H, W))).astype(np.float32)
    rho = rng.random((B, H, W)).astype(np.float32)
    return flags, U, rho


def test_line_trace_matches_oracle(rng, fields):
    flags, U, _ = fields
    dt = 0.6
    cc = np.asarray(ops.get_centered(U))
    disp = -dt * cc
    disp[:, :, 0, :] = 0
    disp[:, :, -1, :] = 0
    disp[:, :, :, 0] = 0
    disp[:, :, :, -1] = 0
    xx = np.arange(W, dtype=np.float32)[None, None, :] + 0.5
    yy = np.arange(H, dtype=np.float32)[None, :, None] + 0.5
    pos = np.stack(
        [np.broadcast_to(xx, (B, H, W)), np.broadcast_to(yy, (B, H, W))],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(ops.calc_line_trace(pos, disp, flags, True))
    for bi in range(B):
        for j in range(H):
            for i in range(W):
                wx, wy = orc.line_trace_single(
                    i + 0.5, j + 0.5,
                    disp[bi, 0, j, i], disp[bi, 1, j, i], flags[bi],
                )
                assert abs(got[bi, 0, j, i] - wx) < 1e-4, (i, j)
                assert abs(got[bi, 1, j, i] - wy) < 1e-4, (i, j)


@pytest.mark.parametrize("sample_outside", [False, True])
@pytest.mark.parametrize("method", ["eulerFluidNet", "maccormackFluidNet"])
def test_advect_scalar(fields, method, sample_outside):
    flags, U, rho = fields
    dt, strength = 0.3, 0.6
    got = np.asarray(
        ops.advect_scalar(
            dt, rho, U, flags, method=method,
            sample_outside_fluid=sample_outside,
            maccormack_strength=strength,
        )
    )
    want = orc.advect_scalar(
        dt, rho, U, flags, sample_outside_fluid=sample_outside,
        maccormack_strength=strength, method=method,
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("method", ["eulerFluidNet", "maccormackFluidNet"])
def test_advect_velocity(fields, method):
    flags, U, _ = fields
    dt, strength = 0.25, 0.6
    got = np.asarray(
        ops.advect_velocity(
            dt, U, U, flags, method=method, maccormack_strength=strength
        )
    )
    want = orc.advect_velocity(
        dt, U, U, flags, maccormack_strength=strength, method=method
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_advect_scalar_large_dt(rng):
    """Back-traces crossing several cells (line-trace marching loop > 1 step)."""
    flags = random_flags(rng, 1, 20, 20, p_obstacle=0.05)
    U = (4.0 * rng.standard_normal((1, 2, 20, 20))).astype(np.float32)
    rho = rng.random((1, 20, 20)).astype(np.float32)
    got = np.asarray(ops.advect_scalar(1.0, rho, U, flags))
    want = orc.advect_scalar(1.0, rho, U, flags)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_advect_velocity_is_differentiable(fields):
    import jax
    import jax.numpy as jnp

    flags, U, _ = fields

    def loss(u):
        out = ops.advect_velocity(0.2, u, u, flags)
        return jnp.sum(out**2)

    g = jax.grad(loss)(jnp.asarray(U))
    assert np.isfinite(np.asarray(g)).all()


def _centers(B, H, W):
    xx = np.arange(W, dtype=np.float32)[None, None, :] + 0.5
    yy = np.arange(H, dtype=np.float32)[None, :, None] + 0.5
    return np.stack(
        [np.broadcast_to(xx, (B, H, W)), np.broadcast_to(yy, (B, H, W))],
        axis=1,
    ).astype(np.float32)


def test_line_trace_firsthit_invariant(rng):
    """First-hit trace never lands inside a blocked cell nor outside the
    domain (the reference march's loop invariant)."""
    from fluidnet_cxx_tpu.celltype import FLUID
    from fluidnet_cxx_tpu.ops.line_trace import line_trace_firsthit

    flags = random_flags(rng, 2, 24, 28, p_obstacle=0.15)
    U = (3.0 * rng.standard_normal((2, 2, 24, 28))).astype(np.float32)
    disp = np.clip(-0.8 * np.asarray(ops.get_centered(U)), -4, 4)
    pos = _centers(2, 24, 28)
    got = np.asarray(line_trace_firsthit(pos, disp, flags, D=4))
    fluid = np.asarray(flags) == FLUID
    ix = np.clip(np.trunc(got[:, 0]).astype(int), 0, 27)
    iy = np.clip(np.trunc(got[:, 1]).astype(int), 0, 23)
    land = np.take_along_axis(
        np.asarray(flags).reshape(2, -1), (iy * 28 + ix).reshape(2, -1), 1
    ).reshape(2, 24, 28)
    assert (land[fluid] == FLUID).all()
    assert (got[:, 0][fluid] > 0).all() and (got[:, 0][fluid] < 28).all()
    assert (got[:, 1][fluid] > 0).all() and (got[:, 1][fluid] < 24).all()


def test_line_trace_firsthit_matches_march_no_obstacles(rng):
    """With no internal obstacles the two formulations stop at the same
    points (full displacement, or the border obstacle ring)."""
    from fluidnet_cxx_tpu.ops.line_trace import line_trace_firsthit
    from fluidnet_cxx_tpu.ops.window import make_blocked_lookup_window

    flags = random_flags(rng, 1, 24, 28, p_obstacle=0.0)
    U = (3.0 * rng.standard_normal((1, 2, 24, 28))).astype(np.float32)
    disp = np.clip(-0.7 * np.asarray(ops.get_centered(U)), -4, 4)
    disp[:, :, 0, :] = 0
    disp[:, :, -1, :] = 0
    disp[:, :, :, 0] = 0
    disp[:, :, :, -1] = 0
    pos = _centers(1, 24, 28)
    fh = np.asarray(line_trace_firsthit(pos, disp, flags, D=4))
    mc = np.asarray(
        ops.calc_line_trace(
            pos, disp, flags, True,
            blocked_lookup=make_blocked_lookup_window(flags, 4),
        )
    )
    from fluidnet_cxx_tpu.celltype import FLUID

    fluid = (np.asarray(flags) == FLUID)[:, None]
    np.testing.assert_allclose(np.where(fluid, fh, 0),
                               np.where(fluid, mc, 0), atol=2e-4)


def test_line_trace_firsthit_vs_march_with_obstacles(rng):
    """With random internal obstacles (12% — far denser than any canonical
    scene) the continuous first-hit trace differs from the iterative march
    ONLY by stopping earlier: the march samples the ray at unit steps and
    can step over a corner-clipped blocked cell; the continuous
    formulation never tunnels. Measured here: ~97% of fluid-cell traces
    are identical, and every differing ray stops strictly EARLIER."""
    from fluidnet_cxx_tpu.celltype import FLUID
    from fluidnet_cxx_tpu.ops.line_trace import line_trace_firsthit
    from fluidnet_cxx_tpu.ops.window import make_blocked_lookup_window

    flags = random_flags(rng, 2, 24, 28, p_obstacle=0.12)
    U = (2.5 * rng.standard_normal((2, 2, 24, 28))).astype(np.float32)
    disp = np.clip(-0.6 * np.asarray(ops.get_centered(U)), -4, 4)
    disp[:, :, 0, :] = 0
    disp[:, :, -1, :] = 0
    disp[:, :, :, 0] = 0
    disp[:, :, :, -1] = 0
    pos = _centers(2, 24, 28)
    fh = np.asarray(line_trace_firsthit(pos, disp, flags, D=4))
    mc = np.asarray(
        ops.calc_line_trace(
            pos, disp, flags, True,
            blocked_lookup=make_blocked_lookup_window(flags, 4),
        )
    )
    fluid = np.asarray(flags) == FLUID
    d = np.abs(fh - mc).max(axis=1)
    same = (d < 1e-3) | ~fluid
    assert same[fluid].mean() >= 0.95, same[fluid].mean()
    # every disagreement is an earlier stop (anti-tunneling), never later
    tf = np.linalg.norm(fh - pos, axis=1)
    tm = np.linalg.norm(mc - pos, axis=1)
    later = (~same) & (tf > tm + 1e-3) & fluid
    assert not later.any()
