"""Vorticity confinement: zero strength is identity; positive strength
amplifies swirl; step integration stays stable."""
import jax
import numpy as np

from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.ops import empty_domain


def vortex_field(h, w, strength=1.0):
    """A centred solid-body-ish vortex velocity field."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = w / 2, h / 2
    r2 = (xx - cx) ** 2 + (yy - cy) ** 2
    g = strength * np.exp(-r2 / (0.1 * h * w) * 4)
    U = np.zeros((1, 2, h, w), np.float32)
    U[0, 0] = -(yy - cy) * g / h
    U[0, 1] = (xx - cx) * g / w
    return U


def test_zero_strength_is_identity():
    flags = empty_domain(1, 24, 24)
    U = vortex_field(24, 24)
    out = np.asarray(ops.add_vorticity_confinement(U, flags, 0.0, 0.1))
    np.testing.assert_array_equal(out, U)


def test_confinement_amplifies_vorticity():
    flags = empty_domain(1, 32, 32)
    U = vortex_field(32, 32)
    w0 = np.abs(np.asarray(ops.curl2d(U))).sum()
    out = np.asarray(ops.add_vorticity_confinement(U, flags, 2.0, 0.5))
    w1 = np.abs(np.asarray(ops.curl2d(out))).sum()
    assert np.isfinite(out).all()
    assert w1 > w0 * 1.001


def test_confined_step_stays_stable():
    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    cfg = plume_config(jacobi_iter=20).replace(vorticity_confinement=1.0)
    state = create_plume_scene(32, 32)
    step = jax.jit(lambda s: simulate_step(cfg, s))
    for _ in range(15):
        state = step(state)
    assert np.isfinite(np.asarray(state.U)).all()
    assert np.abs(np.asarray(state.U)).max() < 10.0
