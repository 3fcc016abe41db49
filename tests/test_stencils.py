"""jnp stencil ops vs the scalar-loop NumPy oracle (max-abs err < 1e-6,
matching the reference's test tolerance, ref: solver_cpp/test/test_fluid.cpp:73)."""
import numpy as np
import pytest

from conftest import random_flags
from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.oracle import np_oracle as orc

B, H, W = 2, 18, 26
TOL = 1e-6


@pytest.fixture
def fields(rng):
    flags = random_flags(rng, B, H, W, p_obstacle=0.15, p_empty=0.1)
    U = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    p = rng.standard_normal((B, H, W)).astype(np.float32)
    rho = rng.standard_normal((B, H, W)).astype(np.float32)
    return flags, U, p, rho


def test_velocity_divergence(fields):
    flags, U, _, _ = fields
    got = np.asarray(ops.velocity_divergence(U, flags))
    want = orc.velocity_divergence(U, flags)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_velocity_update(fields):
    flags, U, p, _ = fields
    got = np.asarray(ops.velocity_update(p, U, flags))
    want = orc.velocity_update(p, U, flags)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_set_wall_bcs(fields):
    flags, U, _, _ = fields
    got = np.asarray(ops.set_wall_bcs(U, flags))
    want = orc.set_wall_bcs(U, flags)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_add_buoyancy(fields):
    flags, U, _, rho = fields
    g = np.array([0.3, -0.9, 0.0], np.float32)
    got = np.asarray(ops.add_buoyancy(U, flags, rho, g, 0.1, 0.25))
    want = orc.add_buoyancy(U, flags, rho, g, 0.1, 0.25)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_add_gravity(fields):
    flags, U, _, _ = fields
    g = np.array([0.1, -1.0, 0.0], np.float32)
    got = np.asarray(ops.add_gravity(U, flags, g, 0.25))
    want = orc.add_gravity(U, flags, g, 0.25)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_add_viscosity(fields):
    flags, U, _, _ = fields
    got = np.asarray(ops.add_viscosity(0.1, U, flags, 0.05))
    want = orc.add_viscosity(0.1, U, flags, 0.05)
    np.testing.assert_allclose(got, want, atol=TOL)


def test_flags_to_occupancy(fields):
    flags, _, _, _ = fields
    occ = np.asarray(ops.flags_to_occupancy(flags))
    assert set(np.unique(occ[np.isin(flags, [1, 2])])) <= {0.0, 1.0}
    assert (occ[flags == 1] == 0).all()
    assert (occ[flags == 2] == 1).all()


def test_empty_domain():
    flags = np.asarray(ops.empty_domain(1, 8, 9))
    assert (flags[0, 0, :] == 2).all() and (flags[0, :, -1] == 2).all()
    assert (flags[0, 1:-1, 1:-1] == 1).all()


def test_get_centered_and_mac(fields):
    flags, U, _, _ = fields
    np.testing.assert_allclose(
        np.asarray(ops.get_centered(U)), orc.get_centered(U), atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(ops.get_at_mac_x(U)), orc.get_at_mac(U, 0), atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(ops.get_at_mac_y(U)), orc.get_at_mac(U, 1), atol=TOL
    )


def test_interpol_matches_oracle(rng, fields):
    flags, _, p, _ = fields
    pos = np.zeros((B, 2, H, W), np.float32)
    pos[:, 0] = rng.uniform(-1, W + 1, (B, H, W))
    pos[:, 1] = rng.uniform(-1, H + 1, (B, H, W))
    got = np.asarray(ops.interpol(p, pos))
    got_f = np.asarray(ops.interpol_with_fluid(p, flags, pos))
    for bi in range(B):
        for j in range(0, H, 3):
            for i in range(0, W, 5):
                want = orc.interpol(p[bi], pos[bi, 0, j, i], pos[bi, 1, j, i])
                assert abs(got[bi, j, i] - want) < 1e-5
                want_f = orc.interpol_with_fluid(
                    p[bi], flags[bi], pos[bi, 0, j, i], pos[bi, 1, j, i]
                )
                assert abs(got_f[bi, j, i] - want_f) < 1e-5
