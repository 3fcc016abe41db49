"""C++ native library (fast .bin parser + scalar-loop oracle kernels) vs the
NumPy oracle and the jnp ops."""
import numpy as np
import pytest

from conftest import random_flags
from fluidnet_cxx_tpu import native, ops
from fluidnet_cxx_tpu.oracle import np_oracle as orc

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

B, H, W = 2, 18, 22


@pytest.fixture
def fields(rng):
    flags = random_flags(rng, B, H, W, p_obstacle=0.12, p_empty=0.08)
    U = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    rho = rng.random((B, H, W)).astype(np.float32)
    p = rng.standard_normal((B, H, W)).astype(np.float32)
    return flags, U, rho, p


def test_native_matches_numpy_oracle(fields):
    flags, U, rho, p = fields
    g = np.array([0.3, -0.9, 0.0], np.float32)
    np.testing.assert_array_equal(
        native.velocity_divergence(U, flags),
        orc.velocity_divergence(U, flags),
    )
    np.testing.assert_array_equal(
        native.velocity_update(p, U, flags),
        orc.velocity_update(p, U, flags),
    )
    np.testing.assert_array_equal(
        native.set_wall_bcs(U, flags), orc.set_wall_bcs(U, flags)
    )
    np.testing.assert_array_equal(
        native.add_buoyancy(U, flags, rho, g, 0.1, 0.25),
        orc.add_buoyancy(U, flags, rho, g, 0.1, 0.25),
    )
    np.testing.assert_array_equal(
        native.add_gravity(U, flags, g, 0.25),
        orc.add_gravity(U, flags, g, 0.25),
    )


def test_native_jacobi_matches_jnp(fields):
    flags, U, _, _ = fields
    div = np.asarray(ops.velocity_divergence(U, flags))
    p_nat, _ = native.solve_jacobi(flags, div, 40)
    p_jnp = np.asarray(ops.solve_jacobi_fixed(flags, div, 40))
    np.testing.assert_allclose(p_nat, p_jnp, atol=1e-5)


def test_native_advect_matches_jnp_notrace(fields):
    flags, U, rho, _ = fields
    got = native.advect_scalar(0.3, rho, U, flags, strength=0.6)
    want = np.asarray(
        ops.advect_scalar(
            0.3, rho, U, flags, maccormack_strength=0.6, line_trace=False
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_native_bin_loader(tmp_path, fields):
    from fluidnet_cxx_tpu.data import load_manta_file, save_manta_file

    flags, U, rho, p = fields
    f = str(tmp_path / "x.bin")
    save_manta_file(f, p[0], U[0], flags[0], rho[0])
    out = native.load_manta_bin2d(f)
    assert out is not None
    p2, U2, flags2, rho2 = out
    np.testing.assert_array_equal(p2, p[0])
    np.testing.assert_array_equal(U2, U[0])
    np.testing.assert_array_equal(flags2, flags[0])
    # the python loader auto-dispatches to the native parser
    p3, _, _, _, is3d = load_manta_file(f)
    assert not is3d
    np.testing.assert_array_equal(p3, p[0])
