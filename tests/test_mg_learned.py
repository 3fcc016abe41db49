"""mg_learned: learned coarse-grid correction inside the V-cycle.

Covers the solver hook (ops/multigrid.py coarse_fn/coarse_size), the
collector (mg_cut_rhs), the net's output contract, and the end-to-end
projection callable in a simulate_step rollout.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.models.mg_coarse import (
    MGCoarseConfig,
    MGCoarseNet,
    _cont,
    init_mg_coarse_params,
    make_coarse_fn,
    make_project_fn_mg_learned,
)
from fluidnet_cxx_tpu.ops.jacobi import solve_jacobi_fixed
from fluidnet_cxx_tpu.ops.multigrid import (
    _cut_level,
    _levels,
    mg_cut_rhs,
    residual,
    solve_mg,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _scene(rng, h=64, w=64):
    from fluidnet_cxx_tpu.ops.stencils import empty_domain, set_wall_bcs

    flags = np.array(empty_domain(1, h, w))  # writable copy
    flags[0, 20:28, 30:40] = 2
    flags = jnp.asarray(flags)
    U = jnp.asarray(rng.standard_normal((1, 2, h, w)), jnp.float32)
    U = set_wall_bcs(U, flags)
    return flags, U


def test_mg_cut_rhs_shapes_and_compatibility(rng):
    flags, U = _scene(rng)
    div = ops.velocity_divergence(U, flags)
    fc, rc = mg_cut_rhs(flags, div, coarse_size=32)
    assert fc.shape == (1, 32, 32) and rc.shape == (1, 32, 32)
    cont = _cont(fc)
    # rhs is projected onto range(A): zero sum over continuation cells.
    assert abs(float(jnp.sum(rc * cont))) < 1e-4
    # dead cells carry no rhs
    assert float(jnp.abs(rc * (1 - cont)).max()) == 0.0


def test_exact_coarse_fn_beats_plain_single_cycle(rng):
    """With a CONVERGED solve as coarse_fn at the 32-cut, one V-cycle must
    beat the plain one-V-cycle residual (the hybrid's premise: a better
    coarse correction buys convergence per cycle)."""
    flags, U = _scene(rng)
    div = ops.velocity_divergence(U, flags)

    def exact(fc, rc):
        return solve_jacobi_fixed(fc, rc, 600, damping=2.0 / 3.0)

    p_h = solve_mg(flags, div, n_vcycles=1, coarse_fn=exact, coarse_size=32)
    p_p = solve_mg(flags, div, n_vcycles=1)
    r_h = float(jnp.abs(residual(flags, div, p_h)).max())
    r_p = float(jnp.abs(residual(flags, div, p_p)).max())
    assert np.isfinite(r_h)
    assert r_h <= r_p * 1.05, (r_h, r_p)


def test_cut_level_selection():
    flags = jnp.ones((1, 64, 64), jnp.int32)
    lvls = _levels(flags, 8)
    assert _cut_level(lvls, 32) == 1
    assert _cut_level(lvls, 16) == 2
    # learned solve AT the finest level is not a hybrid -> None
    assert _cut_level(lvls, 64) == 1 or _cut_level(lvls, 64) is None


def test_mg_coarse_net_contract(rng):
    """Untrained net: right shape, gauge-fixed (zero mean over cont),
    pinned on dead cells, scale-equivariant by construction."""
    model = MGCoarseNet(MGCoarseConfig(widths=(16, 16)))
    flags = jnp.asarray(
        np.where(rng.random((1, 32, 32)) < 0.1, 2, 1).astype(np.int32))
    rhs = jnp.asarray(rng.standard_normal((1, 32, 32)), jnp.float32)
    params = init_mg_coarse_params(model, jax.random.PRNGKey(0), 32, 32)
    e = model.apply(params, flags, rhs)
    cont = _cont(flags)
    assert e.shape == (1, 32, 32)
    assert abs(float(jnp.sum(e * cont))) < 1e-3
    assert float(jnp.abs(e * (1 - cont)).max()) == 0.0
    e2 = model.apply(params, flags, 100.0 * rhs)
    np.testing.assert_allclose(
        np.asarray(e2), 100.0 * np.asarray(e), rtol=2e-2, atol=1e-4)


def test_mg_learned_projection_in_step(rng):
    """End-to-end: simulate_step with the mg_learned projection callable
    stays finite and reduces |div| vs the unprojected field (untrained net
    — the post sweeps and fine levels must carry it)."""
    from fluidnet_cxx_tpu.sim import (
        create_plume_scene,
        plume_config,
        simulate_step,
    )

    model = MGCoarseNet(MGCoarseConfig(widths=(16, 16)))
    params = init_mg_coarse_params(model, jax.random.PRNGKey(0), 32, 32)
    project = make_project_fn_mg_learned(model, params, coarse_size=32)
    cfg = plume_config(sim_method="convnet", buoyancy_scale=0.5)
    state = create_plume_scene(64, 64, density_val=0.5, u_scale=1.0)
    step = jax.jit(lambda s: simulate_step(cfg, s, project_fn=project))
    for _ in range(5):
        state = step(state)
    div = ops.velocity_divergence(state.U, state.flags)
    fl = (state.flags == 1) & (state.U_bc_inv_mask[:, 1] > 0.5)
    assert np.isfinite(np.asarray(state.U)).all()
    assert float(jnp.where(fl, jnp.abs(div), 0).max()) < 0.5
