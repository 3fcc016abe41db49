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
