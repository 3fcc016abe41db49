"""Geometric multigrid V-cycle: convergence on the obstacle-aware Neumann
pressure problem (beyond-reference; used as converged ground truth + the
honest classical baseline in quality-per-ms)."""
import jax.numpy as jnp
import numpy as np

from conftest import random_flags
from fluidnet_cxx_tpu.ops import multigrid as mg
from fluidnet_cxx_tpu.ops import ops3d
from fluidnet_cxx_tpu.ops.stencils import empty_domain


def test_mg_converges_with_obstacles(rng):
    """V-cycles drive the residual of a manufactured compatible problem
    (rhs = A p*) down orders of magnitude, interior obstacles included."""
    flags = random_flags(rng, 1, 64, 64, p_obstacle=0.05)
    cont = np.asarray(mg._cont_mask(flags)) > 0
    pstar = (rng.standard_normal((1, 64, 64)).astype(np.float32)) * cont
    rhs = mg.apply_A(flags, jnp.asarray(pstar))

    p = mg.solve_mg(flags, rhs, n_vcycles=8)
    r = float(jnp.max(jnp.abs(mg.residual(flags, rhs, p))))
    r0 = float(jnp.max(jnp.abs(rhs)))
    assert r < 5e-3 * r0, (r, r0)


def test_mg_beats_jacobi_at_equal_sweeps(rng):
    """2 V-cycles (~22 fine-sweep equivalents of work) must beat 100 plain
    Jacobi sweeps on residual — the reason MG exists."""
    from fluidnet_cxx_tpu.ops.jacobi import solve_jacobi_fixed

    flags = empty_domain(1, 64, 64)
    cont = np.asarray(mg._cont_mask(flags)) > 0
    pstar = (rng.standard_normal((1, 64, 64)).astype(np.float32)) * cont
    rhs = mg.apply_A(flags, jnp.asarray(pstar))

    p_mg = mg.solve_mg(flags, rhs, n_vcycles=2)
    p_j = solve_jacobi_fixed(flags, rhs, 100)
    r_mg = float(jnp.max(jnp.abs(mg.residual(flags, rhs, p_mg))))
    r_j = float(jnp.max(jnp.abs(mg.residual(flags, rhs, p_j))))
    assert r_mg < r_j, (r_mg, r_j)


def test_mg_incompatible_rhs_stays_bounded(rng):
    """An inlet-like rhs with net mass flux (sum_cont rhs != 0) must not
    blow up — the per-level compatibility projection bounds the iterate
    (an unprojected V-cycle measures x8/cycle divergence)."""
    flags = empty_domain(1, 64, 64)
    rhs = jnp.zeros((1, 64, 64), jnp.float32).at[:, 30:34, 30:34].set(2.0)

    p4 = mg.solve_mg(flags, rhs, n_vcycles=4)
    p8 = mg.solve_mg(flags, rhs, n_vcycles=8)
    assert np.isfinite(np.asarray(p8)).all()
    # converged: extra cycles change nothing (vs the compatible part)
    rhs_c = mg._remove_incompatible(flags, rhs)
    r4 = float(jnp.max(jnp.abs(mg.residual(flags, rhs_c, p4))))
    r8 = float(jnp.max(jnp.abs(mg.residual(flags, rhs_c, p8))))
    assert r8 <= r4 + 1e-6 and r8 < 1e-3, (r4, r8)


def test_mg3_converges(rng):
    """3-D V-cycle on a manufactured compatible problem."""
    flags = ops3d.empty_domain3(1, 32, 32, 32)
    cont = np.asarray(mg._cont_mask(flags)) > 0
    pstar = (rng.standard_normal((1, 32, 32, 32)).astype(np.float32)) * cont
    rhs = mg.apply_A3(flags, jnp.asarray(pstar))

    p = mg.solve_mg3(flags, rhs, n_vcycles=8)
    r = float(jnp.max(jnp.abs(mg._residual3(flags, rhs, p))))
    r0 = float(jnp.max(jnp.abs(rhs)))
    assert r < 2e-2 * r0, (r, r0)


def test_mg_constant_null_vector():
    """A constant on the fluid region is in A's null space at every level,
    and the prolongation of a constant coarse correction is constant on
    fine fluid cells (the property whose violation made early cycles
    diverge)."""
    flags = empty_domain(1, 32, 32)
    cont = mg._cont_mask(flags)
    c = 3.0 * cont
    assert float(jnp.max(jnp.abs(mg.apply_A(flags, c)))) == 0.0

    fc = mg._coarsen_flags(flags)
    cont_c = mg._cont_mask(fc)
    e_c = 2.0 * cont_c
    e_ext = mg._neumann_extend(fc, e_c)
    fine = mg._prolong(e_ext)
    fine_live = np.asarray(fine)[np.asarray(cont) > 0]
    np.testing.assert_allclose(fine_live, 2.0, atol=1e-6)


def test_sim_method_multigrid_runs_plume():
    """sim_method='multigrid' drives a closed-loop plume with far lower
    divergence than the same-scene Jacobi-34 default."""
    import jax

    from fluidnet_cxx_tpu import ops
    from fluidnet_cxx_tpu.sim import (
        create_plume_scene,
        plume_config,
        simulate_step,
    )

    state = create_plume_scene(64, 64, u_scale=1.0, rad=0.15)
    cfg = plume_config(sim_method="multigrid", mg_vcycles=2,
                       line_trace=False)
    step = jax.jit(lambda s: simulate_step(cfg, s))
    for _ in range(30):
        state = step(state)
    rho = np.asarray(state.density)
    div = np.asarray(ops.velocity_divergence(state.U, state.flags))
    fl = np.asarray((state.flags == 1)
                    & (state.U_bc_inv_mask[:, 1] > 0.5))
    assert np.isfinite(rho).all()
    assert np.abs(div * fl).max() < 0.02, np.abs(div * fl).max()


def test_levels3_depth_cap():
    """SimConfig.mg_max_levels3 guards the 3-D closed loop: >=4-level
    hierarchies diverge in time-stepping (docs/results/mg3_probe_r4.log),
    so the step path caps _levels3 at the measured-stable 3 while
    single-solve ground truth stays uncapped (VERDICT r4 item 3)."""
    from fluidnet_cxx_tpu.config import SimConfig

    flags = ops3d.empty_domain3(1, 64, 64, 64)
    assert len(mg._levels3(flags, 8)) >= 4          # uncapped walks deep
    assert len(mg._levels3(flags, 8, 3)) == 3       # capped
    assert SimConfig().mg_max_levels3 == 3          # default guards the step

    # capped solve still converges on a manufactured compatible problem
    rng = np.random.default_rng(0)
    cont = np.asarray(mg._cont_mask(flags)) > 0
    pstar = rng.standard_normal((1, 64, 64, 64)).astype(np.float32) * cont
    rhs = mg.apply_A3(flags, jnp.asarray(pstar))
    p = mg.solve_mg3(flags, rhs, n_vcycles=6, max_levels=3)
    r = float(jnp.max(jnp.abs(mg._residual3(flags, rhs, p))))
    r0 = float(jnp.max(jnp.abs(rhs)))
    assert r < 5e-2 * r0, (r, r0)


def test_mg3_closed_loop_stable_64(monkeypatch):
    """Closed-loop 3-D multigrid time-stepping at 64^3, UNCAPPED depth (the
    >=4-level regime that diverged before the post3=8 fix: the deepest
    prolongation's corner kink needed (5/7)^post < ~0.1 — mg3_fix probe).
    Stays bounded with the default mg_post3. Opt-in: ~minutes on the 1-core
    CPU box; set RUN_BIG_MG3_TEST=1."""
    import os

    import pytest

    if not os.environ.get("RUN_BIG_MG3_TEST"):
        pytest.skip("expensive closed-loop proof; set RUN_BIG_MG3_TEST=1")
    import jax

    from fluidnet_cxx_tpu.sim import plume_config
    from fluidnet_cxx_tpu.sim.scenes3 import create_plume_scene3
    from fluidnet_cxx_tpu.sim.step3d import simulate_step3

    state = create_plume_scene3(64, 64, 64, density_val=0.1, u_scale=0.6)
    cfg = plume_config(dt=0.25, buoyancy_scale=0.5,
                       gravity_vec=(0.0, -1.0, 0.0), max_disp=1,
                       advection_impl="window", use_pallas=False,
                       sim_method="multigrid", mg_vcycles=2,
                       mg_warm_start=False, line_trace=False,
                       mg_max_levels3=0)  # uncapped: 4 levels at 64^3
    step = jax.jit(lambda s: simulate_step3(cfg, s))
    for _ in range(30):
        state = step(state)
    div = np.asarray(ops3d.velocity_divergence3(state.U, state.flags))
    assert np.isfinite(np.asarray(state.U)).all()
    assert np.abs(div).max() < 1.0, np.abs(div).max()
