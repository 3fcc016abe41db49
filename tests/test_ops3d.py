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


def test_advect3_window_matches_gather(rng):
    """Bounded-window 3-D advection == gather advection while per-axis
    displacements stay <= max_disp."""
    flags = np.asarray(ops3d.empty_domain3(1, 10, 14, 14))
    U = np.clip(1.5 * rng.standard_normal((1, 3, 10, 14, 14)), -2, 2
                ).astype(np.float32)
    rho = rng.random((1, 10, 14, 14)).astype(np.float32)
    dt = 0.8  # |disp| <= 2*0.8 = 1.6 < max_disp=2
    g = np.asarray(ops3d.advect_scalar3(dt, rho, U, flags, 0.6,
                                        impl="gather"))
    w_ = np.asarray(ops3d.advect_scalar3(dt, rho, U, flags, 0.6,
                                         impl="window", max_disp=2))
    np.testing.assert_allclose(w_, g, atol=2e-5)
    g = np.asarray(ops3d.advect_velocity3(dt, U, flags, 0.6, impl="gather"))
    w_ = np.asarray(ops3d.advect_velocity3(dt, U, flags, 0.6,
                                           impl="window", max_disp=2))
    np.testing.assert_allclose(w_, g, atol=2e-5)


def test_line_trace3_slab_equivalence(rng):
    """3-D line trace on a z-uniform slab == 2-D line trace layer-wise."""
    from fluidnet_cxx_tpu.ops.line_trace import calc_line_trace
    from fluidnet_cxx_tpu.ops.line_trace3 import calc_line_trace3

    flags2 = random_flags(rng, B, H, W, p_obstacle=0.12)
    d = 6
    flags3 = np.repeat(flags2[:, None], d, axis=1)

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pos2 = np.stack([xx + 0.5, yy + 0.5], 0)[None]
    delta2 = (2.5 * rng.standard_normal((B, 2, H, W))).astype(np.float32)

    got2 = np.asarray(calc_line_trace(pos2, delta2, flags2))

    # z-centred start, zero z delta: every interior layer must reproduce
    # the 2-D result in (x, y).
    pos3 = np.zeros((B, 3, d, H, W), np.float32)
    delta3 = np.zeros((B, 3, d, H, W), np.float32)
    for k in range(d):
        pos3[:, 0, k], pos3[:, 1, k] = pos2[:, 0], pos2[:, 1]
        pos3[:, 2, k] = k + 0.5
        delta3[:, 0, k], delta3[:, 1, k] = delta2[:, 0], delta2[:, 1]
    got3 = np.asarray(calc_line_trace3(pos3, delta3, flags3))

    k = d // 2  # interior layer, away from the z walls
    fl = flags2 == 1
    np.testing.assert_allclose(got3[:, 0, k][fl], got2[:, 0][fl], atol=1e-4)
    np.testing.assert_allclose(got3[:, 1, k][fl], got2[:, 1][fl], atol=1e-4)
    np.testing.assert_allclose(got3[:, 2, k][fl], k + 0.5, atol=1e-6)

    # invariant: traced points never end up inside solid / out of domain
    from fluidnet_cxx_tpu.ops.line_trace3 import _is_blocked_cell3
    blocked = np.asarray(_is_blocked_cell3(got3, flags3))
    start_ok = flags3 == 1
    assert not (blocked & start_ok).any()


def test_stick_bcs3_slab_equivalence(rng):
    """3-D stick BCs on a z-uniform slab match the 2-D version for the
    in-plane components. Stick cells are placed on a checkerboard (no
    adjacent pairs) so the 3-D corner rule's extrusion-axis exclusion and
    the 2-D corner rule agree (see set_wall_bcs_stick3 docstring)."""
    from fluidnet_cxx_tpu.celltype import STICK
    from fluidnet_cxx_tpu.ops.stencils import set_wall_bcs_stick

    flags2 = random_flags(rng, B, H, W, p_obstacle=0.1)
    yy, xx = np.mgrid[0:H, 0:W]
    checker = ((yy + xx) % 2 == 0)[None]
    stick2 = np.where(
        (flags2 == 2) & checker & (rng.random((B, H, W)) < 0.7), STICK, 0
    ).astype(np.int32)

    U2 = rng.standard_normal((B, 2, H, W)).astype(np.float32)
    d = 4
    flags3 = np.repeat(flags2[:, None], d, axis=1)
    stick3 = np.repeat(stick2[:, None], d, axis=1)
    U3 = np.zeros((B, 3, d, H, W), np.float32)
    for k in range(d):
        U3[:, 0, k], U3[:, 1, k] = U2[:, 0], U2[:, 1]

    got = np.asarray(ops3d.set_wall_bcs_stick3(U3, flags3, stick3))
    want = np.asarray(set_wall_bcs_stick(U2, flags2, stick2))
    k = d // 2
    np.testing.assert_allclose(got[:, 0, k], want[:, 0], atol=1e-6)
    np.testing.assert_allclose(got[:, 1, k], want[:, 1], atol=1e-6)


def test_stick_bcs3_corner_rule_is_extrusion_safe():
    """An extruded straight stick wall keeps its tangential ghost
    reflection (the corner rule must not fire along the extrusion axis);
    an in-plane L-corner still zeroes the ambiguous component."""
    from fluidnet_cxx_tpu.celltype import STICK

    d, h, w = 8, 10, 10
    flags = np.asarray(ops3d.empty_domain3(1, d, h, w)).copy()
    stick = np.zeros((1, d, h, w), np.int32)
    # vertical (y) wall at x=4, extruded through z, fluid on both x sides
    flags[:, :, 3:7, 4] = 2
    stick[:, :, 3:7, 4] = STICK
    U = np.ones((1, 3, d, h, w), np.float32)

    out = np.asarray(ops3d.set_wall_bcs_stick3(U, flags, stick))
    # v (tangential to the wall) in a mid-wall stick cell must be the
    # negated mean of its fluid x-neighbours (-1), not zero: the z and y
    # stick neighbours are a straight continuation, not a corner.
    assert out[0, 1, d // 2, 5, 4] == pytest.approx(-1.0)
    assert np.isfinite(out).all()

    # Extrusion safety of the corner rule: a stick cell diagonal to the
    # wall top has the wall as its u normal-minus neighbour and both-sided
    # stick along z (its own extrusion) — the old `any stick tangential
    # neighbour` rule would zero u here; the extrusion-safe rule keeps the
    # ghost reflection. Fluid y-neighbours of the cell: u(y=5,x=5) was
    # slip-killed to 0 (its x-minus is the wall), u(y=7,x=5) stays 1, so
    # the ghost is -mean(0, 1) = -0.5.
    flags2 = flags.copy()
    stick2 = stick.copy()
    flags2[:, :, 6, 5] = 2
    stick2[:, :, 6, 5] = STICK
    out2 = np.asarray(ops3d.set_wall_bcs_stick3(U, flags2, stick2))
    assert out2[0, 0, d // 2, 6, 5] == pytest.approx(-0.5)

    # non-extruded single-layer wall (z-limited): tangential ghosts intact
    flags3 = np.asarray(ops3d.empty_domain3(1, d, h, w)).copy()
    stick3 = np.zeros((1, d, h, w), np.int32)
    flags3[:, 4, 3:7, 4] = 2   # one z-layer wall
    stick3[:, 4, 3:7, 4] = STICK
    out3 = np.asarray(ops3d.set_wall_bcs_stick3(U, flags3, stick3))
    # w-component at (z=4, y=5, x=4): normal-minus (z=3) is fluid -> rule 2
    # does not kill; tangential ghost from fluid z..: its tangential axes
    # (x, y) have fluid at x±1 -> ghost = -1.
    assert out3[0, 2, 4, 5, 4] == pytest.approx(-1.0)
    assert np.isfinite(out3).all()


def test_periodic_overrides3():
    """periodic-z copies the tangential components at the low z wall from
    the high side."""
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.sim import plume_config
    from fluidnet_cxx_tpu.sim.step3d import SimState3, _wall_bcs3

    d = h = w = 8
    flags = ops3d.empty_domain3(1, d, h, w)
    U = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, 3, d, h, w)),
        jnp.float32,
    )
    state = SimState3(p=jnp.zeros((1, d, h, w)), U=U, flags=flags,
                      density=jnp.zeros((1, d, h, w)))
    cfg = plume_config(periodic_z=True)
    out = np.asarray(_wall_bcs3(cfg, state, U))
    np.testing.assert_allclose(out[:, 0, 1], np.asarray(U)[:, 0, -1])
    np.testing.assert_allclose(out[:, 1, 1], np.asarray(U)[:, 1, -1])


def test_simulate_step3():
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.sim.step3d import create_state3, simulate_step3
    from fluidnet_cxx_tpu.sim import plume_config

    state = create_state3(1, 16, 24, 16)
    rho = np.zeros((1, 16, 24, 16), np.float32)
    rho[0, 6:10, 2:6, 6:10] = 1.0
    state = state._replace(density=jnp.asarray(rho))
    cfg = plume_config(jacobi_iter=40, dt=0.4, max_disp=2)
    step = jax.jit(lambda s: simulate_step3(cfg, s))
    for _ in range(10):
        state = step(state)
    r = np.asarray(state.density)[0]
    assert np.isfinite(r).all()
    yy = np.arange(24)[None, :, None]
    assert (r * yy).sum() / max(r.sum(), 1e-9) > 4.0  # blob rose


def _extrude(a2, d):
    """(b, h, w) -> (b, d, h, w), constant in z."""
    return np.broadcast_to(np.asarray(a2)[:, None], (a2.shape[0], d) + a2.shape[1:]).copy()


def test_add_viscosity3_slab_matches_2d(rng):
    """A z-invariant field with w=0 and z-interior flags: viscosity3 on a
    middle slab == the 2-D add_viscosity (the z-Laplacian term vanishes)."""
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.ops.source_terms import add_viscosity
    from conftest import random_flags

    b, d, h, w = 1, 8, 16, 24
    flags2 = random_flags(rng, b, h, w, p_obstacle=0.1)
    U2 = rng.standard_normal((b, 2, h, w)).astype(np.float32)

    flags3 = _extrude(flags2, d)
    U3 = np.zeros((b, 3, d, h, w), np.float32)
    U3[:, 0] = _extrude(U2[:, 0], d)
    U3[:, 1] = _extrude(U2[:, 1], d)

    out3 = np.asarray(ops3d.add_viscosity3(
        0.1, jnp.asarray(U3), jnp.asarray(flags3), 0.05))
    out2 = np.asarray(add_viscosity(0.1, jnp.asarray(U2),
                                    jnp.asarray(flags2), 0.05))
    # middle slabs see no z-border effects
    np.testing.assert_allclose(out3[:, 0, d // 2], out2[:, 0], atol=1e-6)
    np.testing.assert_allclose(out3[:, 1, d // 2], out2[:, 1], atol=1e-6)


def test_correct_scalar3_slab_matches_2d(rng):
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.ops.source_terms import correct_scalar
    from conftest import random_flags

    b, d, h, w = 1, 4, 12, 16
    flags2 = random_flags(rng, b, h, w)
    rho2 = rng.random((b, h, w)).astype(np.float32)
    div2 = rng.standard_normal((b, h, w)).astype(np.float32)
    out3 = np.asarray(ops3d.correct_scalar3(
        0.2, jnp.asarray(_extrude(rho2, d)), jnp.asarray(_extrude(div2, d)),
        jnp.asarray(_extrude(flags2, d))))
    out2 = np.asarray(correct_scalar(0.2, jnp.asarray(rho2),
                                     jnp.asarray(div2), jnp.asarray(flags2)))
    np.testing.assert_allclose(out3[:, d // 2], out2, atol=1e-6)


def test_vorticity_confinement3_slab_matches_2d(rng):
    """z-invariant planar flow: omega = (0, 0, w_z) and the 3-D confinement
    force on a middle slab reduces to the 2-D formula."""
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.ops.source_terms import add_vorticity_confinement
    from fluidnet_cxx_tpu.ops.stencils import empty_domain

    b, d, h, w = 1, 10, 16, 24
    flags2 = np.asarray(empty_domain(b, h, w))
    U2 = rng.standard_normal((b, 2, h, w)).astype(np.float32)

    flags3 = _extrude(flags2, d)
    U3 = np.zeros((b, 3, d, h, w), np.float32)
    U3[:, 0] = _extrude(U2[:, 0], d)
    U3[:, 1] = _extrude(U2[:, 1], d)

    out3 = np.asarray(ops3d.add_vorticity_confinement3(
        jnp.asarray(U3), jnp.asarray(flags3), 0.5, 0.1))
    out2 = np.asarray(add_vorticity_confinement(
        jnp.asarray(U2), jnp.asarray(flags2), 0.5, 0.1))
    mid = d // 2
    np.testing.assert_allclose(out3[:, 0, mid, 2:-2, 2:-2],
                               out2[:, 0, 2:-2, 2:-2], atol=1e-5)
    np.testing.assert_allclose(out3[:, 1, mid, 2:-2, 2:-2],
                               out2[:, 1, 2:-2, 2:-2], atol=1e-5)


def test_advect_velocity3_orig_carries_viscous_field(rng):
    """advect_velocity3(orig=X) must sample X, not U (the viscous-field
    contract of the 2-D step)."""
    import jax.numpy as jnp

    flags = ops3d.empty_domain3(1, 8, 12, 16)
    U = np.clip(rng.standard_normal((1, 3, 8, 12, 16)), -1, 1).astype(np.float32)
    orig = np.clip(rng.standard_normal((1, 3, 8, 12, 16)), -1, 1).astype(np.float32)
    out_self = np.asarray(ops3d.advect_velocity3(0.3, jnp.asarray(U), flags))
    out_orig = np.asarray(ops3d.advect_velocity3(0.3, jnp.asarray(U), flags,
                                                 orig=jnp.asarray(orig)))
    assert not np.allclose(out_self, out_orig)
    # orig=U must be identical to the default
    out_eq = np.asarray(ops3d.advect_velocity3(0.3, jnp.asarray(U), flags,
                                               orig=jnp.asarray(U)))
    np.testing.assert_allclose(out_self, out_eq)


def test_cylinder3_scene_runs():
    """3-D extruded-cylinder scene: viscosity + stick BCs, bounded flow."""
    import jax
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.sim import plume_config
    from fluidnet_cxx_tpu.sim.scenes3 import create_cylinder_scene3
    from fluidnet_cxx_tpu.sim.step3d import simulate_step3

    state, visc = create_cylinder_scene3(d=8, h=24, w=48, center_x=12.0,
                                         radius=4.5)
    cfg = plume_config(dt=0.3, jacobi_iter=20, viscosity=visc,
                       buoyancy_scale=0.0, advect_density=False,
                       max_disp=2, line_trace=False)
    step = jax.jit(lambda s: simulate_step3(cfg, s))
    for _ in range(8):
        state = step(state)
    U = np.asarray(state.U)
    assert np.isfinite(U).all()
    assert np.abs(U).max() < 10.0
    # no-slip: tangential velocity at faces adjacent to the stick disc ~ 0
    fl = np.asarray(state.flags)
    ob = fl[0] == 2
    # u faces whose west neighbour is obstacle (and cell is fluid)
    west_ob = np.zeros_like(ob)
    west_ob[:, :, 1:] = ob[:, :, :-1]
    tang = np.abs(U[0, 1][(fl[0] == 1) & west_ob])
    assert tang.size and tang.max() < 0.6, tang.max()


def test_line_trace_firsthit3_slab_equivalence(rng):
    """3-D first-hit trace on a z-uniform slab (zero z motion) == the 2-D
    first-hit trace layer-wise, and the traced points obey the invariant
    (never inside solid / outside the domain)."""
    from fluidnet_cxx_tpu.ops.line_trace import line_trace_firsthit
    from fluidnet_cxx_tpu.ops.line_trace3 import (
        _is_blocked_cell3,
        line_trace_firsthit3,
    )

    flags2 = random_flags(rng, B, H, W, p_obstacle=0.12)
    d = 6
    flags3 = np.repeat(flags2[:, None], d, axis=1)

    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    pos2 = np.stack([xx + 0.5, yy + 0.5], 0)[None]
    delta2 = np.clip(
        2.0 * rng.standard_normal((B, 2, H, W)), -2, 2
    ).astype(np.float32)
    got2 = np.asarray(line_trace_firsthit(pos2, delta2, flags2, D=2))

    pos3 = np.zeros((B, 3, d, H, W), np.float32)
    delta3 = np.zeros((B, 3, d, H, W), np.float32)
    for k in range(d):
        pos3[:, 0, k], pos3[:, 1, k] = pos2[:, 0], pos2[:, 1]
        pos3[:, 2, k] = k + 0.5
        delta3[:, 0, k], delta3[:, 1, k] = delta2[:, 0], delta2[:, 1]
    got3 = np.asarray(line_trace_firsthit3(pos3, delta3, flags3, D=2))

    k = d // 2
    fl = flags2 == 1
    np.testing.assert_allclose(got3[:, 0, k][fl], got2[:, 0][fl], atol=1e-4)
    np.testing.assert_allclose(got3[:, 1, k][fl], got2[:, 1][fl], atol=1e-4)
    np.testing.assert_allclose(got3[:, 2, k][fl], k + 0.5, atol=1e-6)

    blocked = np.asarray(_is_blocked_cell3(got3, flags3))
    assert not (blocked & (flags3 == 1)).any()
