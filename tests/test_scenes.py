"""Scene builders: BC mask semantics, cylinder/stick behaviour, box."""
import jax
import jax.numpy as jnp
import numpy as np

from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.sim import (
    add_box2d,
    create_cylinder_scene,
    create_plume_scene,
    cylinder_config,
    simulate_step,
)


def test_plume_bc_masks():
    """Inlet rows 0..3: velocity pinned everywhere (u_scale inside the disc,
    0 outside); density pinned only inside the disc
    (ref: init_conditions.py:60-80)."""
    state = create_plume_scene(32, 32, density_val=0.7, u_scale=1.5, rad=0.2)
    ubc = np.asarray(state.U_bc)
    uinv = np.asarray(state.U_bc_inv_mask)
    rbc = np.asarray(state.density_bc)
    rinv = np.asarray(state.density_bc_inv_mask)

    rad = int(32 * 0.2)
    inside = np.abs(np.arange(32) - 16) <= rad
    assert (uinv[0, :, 0:4, :] == 0).all()      # whole rows pinned
    assert (uinv[0, :, 4:, :] == 1).all()
    assert (ubc[0, 1, 0:4, inside] == 1.5).all()
    assert (ubc[0, 1, 0:4, ~inside] == 0).all()
    assert (ubc[0, 0] == 0).all()               # no x velocity at inlet
    assert (rbc[0, 0:4, inside] == 0.7).all()
    assert (rinv[0, 0:4, inside] == 0).all()
    assert (rinv[0, 0:4, ~inside] == 1).all()   # density free outside disc
    assert (rinv[0, 4:, :] == 1).all()


def test_cylinder_scene_and_stick_bcs():
    state, nu = create_cylinder_scene(
        res_x=96, res_y=48, center_x=24, center_y=24, radius=6.5,
        inlet_vel=1.0, reynolds=100.0,
    )
    assert abs(nu - 1.0 * 13.0 / 100.0) < 1e-6
    flags = np.asarray(state.flags)
    stick = np.asarray(state.flags_stick)
    assert (flags[0, 24, 24] == 2) and (stick[0, 24, 24] == 128)
    # domain walls are obstacle but NOT stick
    assert (flags[0, 0, :] == 2).all() and (stick[0, 0, :] == 2).all()

    cfg = cylinder_config(nu, jacobi_iter=20)
    step = jax.jit(lambda s: simulate_step(cfg, s))
    for _ in range(5):
        state = step(state)
    U = np.asarray(state.U)
    assert np.isfinite(U).all()
    # no-slip: velocity inside the cylinder interior is zero
    inside = (np.arange(96)[None, :] - 24) ** 2 + (
        np.arange(48)[:, None] - 24
    ) ** 2 <= 4.0**2
    assert np.abs(U[0, :, inside]).max() < 1e-5
    # inlet pinned at 1
    assert abs(U[0, 0, 20, 1] - 1.0) < 1e-5


def test_stick_bcs_apply_in_jacobi_path():
    """Stick BCs run in EVERY sim method when the scene carries flags_stick
    (documented divergence, PARITY.md: the reference's jacobi dispatch can
    never reach its stick op — bcs.cpp:86 'TODO: implement TypeStick' — so
    its 'no-slip' jacobi cylinder silently ran free-slip walls)."""
    from fluidnet_cxx_tpu.sim.step import _wall_bcs

    state, nu = create_cylinder_scene(
        res_x=64, res_y=48, center_x=20, center_y=24, radius=5.5,
        inlet_vel=1.0, reynolds=100.0,
    )
    cfg = cylinder_config(nu, jacobi_iter=8)
    assert cfg.sim_method == "jacobi"
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.standard_normal((1, 2, 48, 64)).astype(np.float32))
    got = np.asarray(_wall_bcs(cfg, state, U))
    want = np.asarray(ops.set_wall_bcs_stick(
        ops.set_wall_bcs(U, state.flags), state.flags, state.flags_stick
    ))
    np.testing.assert_array_equal(got, want)
    assert not np.array_equal(got, np.asarray(ops.set_wall_bcs(U, state.flags)))


def test_box2d():
    from fluidnet_cxx_tpu.ops import empty_domain

    flags = empty_domain(1, 16, 16)
    flags = add_box2d(flags, 4, 8, 5, 9)
    f = np.asarray(flags)
    assert (f[0, 5:9, 4:8] == 2).all()
    assert f[0, 9, 4] == 1 and f[0, 5, 8] == 1


def test_output_div_stops_before_projection():
    from fluidnet_cxx_tpu.sim import plume_config

    state = create_plume_scene(24, 24)
    cfg = plume_config(jacobi_iter=20)
    step = jax.jit(lambda s: simulate_step(cfg, s))
    for _ in range(5):  # evolve so the flow field is non-trivial
        state = step(state)
    s_full = simulate_step(cfg, state)
    s_div = simulate_step(cfg, state, output_div=True)
    # pressure untouched in output_div mode, and its velocity is divergent
    np.testing.assert_array_equal(np.asarray(s_div.p), np.asarray(state.p))
    div_before = np.abs(
        np.asarray(ops.velocity_divergence(s_div.U, state.flags))
    )[:, 5:, :].max()
    div_after = np.abs(
        np.asarray(ops.velocity_divergence(s_full.U, state.flags))
    )[:, 5:, :].max()
    assert div_after < div_before
