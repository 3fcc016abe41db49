"""3-D kernels: slab equivalence with the (oracle-verified) 2-D ops plus
projection/stability property tests."""
import jax
import numpy as np
import pytest

from conftest import random_flags
from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.ops import ops3d

B, D, H, W = 1, 3, 16, 20


@pytest.fixture
def slab(rng):
    """A d=3 slab whose single interior z-layer carries a 2-D problem
    (w-velocity zero, fields constant along z in the interior layer)."""
    flags2 = random_flags(rng, B, H, W, p_obstacle=0.1)
    U2 = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    p2 = rng.standard_normal((B, H, W)).astype(np.float32)
    rho2 = rng.random((B, H, W)).astype(np.float32)

    flags3 = np.full((B, D, H, W), 2, np.int32)
    flags3[:, 1] = flags2
    U3 = np.zeros((B, 3, D, H, W), np.float32)
    U3[:, 0, 1] = U2[:, 0]
    U3[:, 1, 1] = U2[:, 1]
    p3 = np.zeros((B, D, H, W), np.float32)
    p3[:, 1] = p2
    rho3 = np.zeros((B, D, H, W), np.float32)
    rho3[:, 1] = rho2
    return (flags2, U2, p2, rho2), (flags3, U3, p3, rho3)


def test_divergence_slab_equivalence(slab):
    (flags2, U2, _, _), (flags3, U3, _, _) = slab
    got = np.asarray(ops3d.velocity_divergence3(U3, flags3))[:, 1]
    want = np.asarray(ops.velocity_divergence(U2, flags2))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_update_slab_equivalence(slab):
    (flags2, U2, p2, _), (flags3, U3, p3, _) = slab
    got = np.asarray(ops3d.velocity_update3(p3, U3, flags3))
    want = np.asarray(ops.velocity_update(p2, U2, flags2))
    np.testing.assert_allclose(got[:, 0, 1], want[:, 0], atol=1e-6)
    np.testing.assert_allclose(got[:, 1, 1], want[:, 1], atol=1e-6)


def test_wall_bcs_slab_equivalence(slab):
    (flags2, U2, _, _), (flags3, U3, _, _) = slab
    got = np.asarray(ops3d.set_wall_bcs3(U3, flags3))
    want = np.asarray(ops.set_wall_bcs(U2, flags2))
    np.testing.assert_allclose(got[:, 0, 1], want[:, 0], atol=1e-6)
    np.testing.assert_allclose(got[:, 1, 1], want[:, 1], atol=1e-6)


def test_sources_slab_equivalence(slab):
    (flags2, U2, _, rho2), (flags3, U3, _, rho3) = slab
    g2 = np.array([0.3, -0.9, 0.0], np.float32)
    got = np.asarray(ops3d.add_buoyancy3(U3, flags3, rho3, g2, 0.1, 0.25))
    want = np.asarray(ops.add_buoyancy(U2, flags2, rho2, g2, 0.1, 0.25))
    np.testing.assert_allclose(got[:, 0, 1], want[:, 0], atol=1e-6)
    np.testing.assert_allclose(got[:, 1, 1], want[:, 1], atol=1e-6)
    got = np.asarray(ops3d.add_gravity3(U3, flags3, g2, 0.25))
    want = np.asarray(ops.add_gravity(U2, flags2, g2, 0.25))
    np.testing.assert_allclose(got[:, 0, 1], want[:, 0], atol=1e-6)


def test_jacobi3_projection_kills_divergence(rng):
    flags = np.asarray(ops3d.empty_domain3(1, 12, 12, 12))
    U = rng.standard_normal((1, 3, 12, 12, 12)).astype(np.float32)
    U = np.asarray(ops3d.set_wall_bcs3(U, flags))
    div = np.asarray(ops3d.velocity_divergence3(U, flags))
    p = np.asarray(ops3d.solve_jacobi_fixed3(flags, div, 600))
    U2 = np.asarray(ops3d.velocity_update3(p, U, flags))
    U2 = np.asarray(ops3d.set_wall_bcs3(U2, flags))
    div2 = np.asarray(ops3d.velocity_divergence3(U2, flags))
    assert np.abs(div2).max() < np.abs(div).max() * 0.02


def test_advection3_stable_and_bounded(rng):
    flags = np.asarray(ops3d.empty_domain3(1, 12, 16, 16))
    U = (3.0 * rng.standard_normal((1, 3, 12, 16, 16))).astype(np.float32)
    rho = rng.random((1, 12, 16, 16)).astype(np.float32)
    r = np.asarray(ops3d.advect_scalar3(0.5, rho, U, flags, 0.6))
    assert np.isfinite(r).all()
    assert r.max() <= rho.max() + 1e-5 and r.min() >= -1e-5  # border ring zeroed
    U2 = np.asarray(ops3d.advect_velocity3(0.5, U, flags, 0.6))
    assert np.isfinite(U2).all()
    assert np.abs(U2).max() <= np.abs(U).max() + 1e-4


def test_step3_smoke():
    """Minimal 3-D buoyant-blob simulation: advect + buoyancy + project."""
    import jax.numpy as jnp

    d = h = w = 16
    flags = ops3d.empty_domain3(1, d, h, w)
    rho = np.zeros((1, d, h, w), np.float32)
    rho[0, 2:6, 2:6, 6:10] = 1.0
    U = jnp.zeros((1, 3, d, h, w))
    rho = jnp.asarray(rho)
    g = jnp.array([0.0, -1.0, 0.0]) * -0.5  # upward buoyancy in +y

    @jax.jit
    def step(U, rho):
        rho = ops3d.advect_scalar3(0.5, rho, U, flags, 0.6)
        U = ops3d.advect_velocity3(0.5, U, flags, 0.6)
        U = ops3d.add_buoyancy3(U, flags, rho, g, 0.0, 0.5)
        U = ops3d.set_wall_bcs3(U, flags)
        div = ops3d.velocity_divergence3(U, flags)
        p = ops3d.solve_jacobi_fixed3(flags, div, 40)
        U = ops3d.velocity_update3(p, U, flags)
        U = ops3d.set_wall_bcs3(U, flags)
        return U, rho

    com0 = None
    for i in range(12):
        U, rho = step(U, rho)
    r = np.asarray(rho)[0]
    assert np.isfinite(r).all()
    yy = np.arange(h)[None, :, None]
    com = (r * yy).sum() / max(r.sum(), 1e-9)
    assert com > 4.2  # blob (initial y-com ~3.5) has risen


def test_simulate_step3():
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.sim.step3d import create_state3, simulate_step3
    from fluidnet_cxx_tpu.sim import plume_config

    state = create_state3(1, 16, 24, 16)
    rho = np.zeros((1, 16, 24, 16), np.float32)
    rho[0, 6:10, 2:6, 6:10] = 1.0
    state = state._replace(density=jnp.asarray(rho))
    cfg = plume_config(jacobi_iter=40, dt=0.4)
    step = jax.jit(lambda s: simulate_step3(cfg, s))
    for _ in range(10):
        state = step(state)
    r = np.asarray(state.density)[0]
    assert np.isfinite(r).all()
    yy = np.arange(24)[None, :, None]
    assert (r * yy).sum() / max(r.sum(), 1e-9) > 4.0  # blob rose
