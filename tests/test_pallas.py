"""Pallas kernels in interpreter mode (CPU) vs the XLA reference ops."""
import jax
import numpy as np
import pytest

from conftest import random_flags
from fluidnet_cxx_tpu import ops


def test_jacobi_pallas_matches_xla(rng, monkeypatch):
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.ops.pallas import jacobi_pallas as jp

    # force interpret mode on CPU
    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    flags = random_flags(rng, 2, 16, 24, p_obstacle=0.1)
    U = rng.standard_normal((2, 2, 16, 24)).astype(np.float32)
    div = np.asarray(ops.velocity_divergence(U, flags))

    got = np.asarray(jp.solve_jacobi_pallas(flags, div, 30))
    want = np.asarray(ops.solve_jacobi_fixed(flags, div, 30))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vmem_fits():
    from fluidnet_cxx_tpu.ops.pallas.jacobi_pallas import vmem_fits

    assert vmem_fits(512, 512)
    assert not vmem_fits(4096, 4096)


def test_advect_velocity_pallas_matches_window(rng):
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import (
        advect_velocity_pallas,
    )

    flags = random_flags(rng, 1, 32, 32, p_obstacle=0.1)
    U = (2.0 * rng.standard_normal((1, 2, 32, 32))).astype(np.float32)
    got = np.asarray(
        advect_velocity_pallas(
            0.3, U, flags, 0.6, max_disp=4, block=16, interpret=True
        )
    )
    want = np.asarray(
        ops.advect_velocity(
            0.3, U, U, flags, maccormack_strength=0.6,
            impl="window", max_disp=4,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_advect_pallas_clamp_limit_across_blocks(rng):
    """Displacements AT the window clamp limit crossing a row-block
    boundary: the chained MacCormack reach is 2*(max_disp+1) rows (bwd
    samples fwd up to D+1 away, whose own src reach is another D+1), so an
    under-sized halo reads circularly-wrapped tile data. Regression for
    the r3 halo formula ceil((D+2)/8)*8 = 8 < 10 at D=4 (ADVICE r3)."""
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import (
        advect_scalar_pallas,
        advect_velocity_pallas,
    )

    flags = random_flags(rng, 1, 64, 32, p_obstacle=0.05)
    # |u|*dt ~ 6 > D=4 everywhere -> every back-trace clips to the window
    # limit; rows near the block=16 boundaries exercise the full halo.
    U = (20.0 + 2.0 * rng.standard_normal((1, 2, 64, 32))).astype(np.float32)
    U[:, 1] *= -1.0
    rho = rng.random((1, 64, 32)).astype(np.float32)
    got_v = np.asarray(advect_velocity_pallas(
        0.3, U, flags, 0.6, max_disp=4, block=16, interpret=True))
    want_v = np.asarray(ops.advect_velocity(
        0.3, U, U, flags, maccormack_strength=0.6, impl="window",
        max_disp=4))
    np.testing.assert_allclose(got_v, want_v, atol=1e-4)
    got_s = np.asarray(advect_scalar_pallas(
        0.3, rho, U, flags, 0.6, max_disp=4, block=16, interpret=True))
    want_s = np.asarray(ops.advect_scalar(
        0.3, rho, U, flags, maccormack_strength=0.6, line_trace=False,
        impl="window", max_disp=4))
    np.testing.assert_allclose(got_s, want_s, atol=1e-5)


def test_advect_scalar_pallas_matches_window(rng):
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import advect_scalar_pallas

    flags = random_flags(rng, 1, 32, 32, p_obstacle=0.1)
    U = (2.0 * rng.standard_normal((1, 2, 32, 32))).astype(np.float32)
    rho = rng.random((1, 32, 32)).astype(np.float32)
    got = np.asarray(
        advect_scalar_pallas(
            0.3, rho, U, flags, 0.6, max_disp=4, block=16, interpret=True
        )
    )
    want = np.asarray(
        ops.advect_scalar(
            0.3, rho, U, flags, maccormack_strength=0.6,
            line_trace=False, impl="window", max_disp=4,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_advect_all_pallas_matches_separate_kernels(rng):
    """The merged scalar+velocity kernel == running the two standalone
    kernels, across {trace off/on} x {self-advect / separate viscous orig}
    (interpret mode). Both pipelines must consume the same pre-advection U,
    exactly as the step does (ref: simulate.py:72-107)."""
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import (
        advect_all_pallas,
        advect_scalar_pallas,
        advect_velocity_pallas,
    )

    flags = random_flags(rng, 1, 32, 64, p_obstacle=0.1)
    U = (2.0 * rng.standard_normal((1, 2, 32, 64))).astype(np.float32)
    rho = rng.random((1, 32, 64)).astype(np.float32)
    orig = (1.5 * rng.standard_normal((1, 2, 32, 64))).astype(np.float32)
    for lt in (False, True):
        for og in (None, orig):
            r_got, U_got = advect_all_pallas(
                0.3, rho, U, flags, 0.6, max_disp=2, block=16,
                interpret=True, line_trace=lt, orig=og,
            )
            r_want = advect_scalar_pallas(
                0.3, rho, U, flags, 0.6, max_disp=2, block=16,
                interpret=True, line_trace=lt,
            )
            U_want = advect_velocity_pallas(
                0.3, U, flags, 0.6, max_disp=2, block=16,
                interpret=True, orig=og,
            )
            # XLA may reassociate float ops differently in the larger
            # fused graph — identical maths, last-ulp differences.
            np.testing.assert_allclose(np.asarray(r_got),
                                       np.asarray(r_want), atol=1e-6)
            np.testing.assert_allclose(np.asarray(U_got),
                                       np.asarray(U_want), atol=1e-6)


def test_advect_all_pallas_column_tiled_matches_separate(rng):
    """Merged kernel on a WIDE grid (w > 1024 engages the 512-lane column
    tiling with a 128-lane halo) == the standalone kernels — the merged
    kernel carries its own copy of the tile DMA/indexing, so the narrow
    test alone would not catch a column-tiling slip."""
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import (
        _pick_cols,
        advect_all_pallas,
        advect_scalar_pallas,
        advect_velocity_pallas,
    )

    w = 1152
    assert _pick_cols(w)[1] > 0  # wide plan engaged
    flags = random_flags(rng, 1, 16, w, p_obstacle=0.05)
    U = np.clip(rng.standard_normal((1, 2, 16, w)), -1, 1
                ).astype(np.float32)
    rho = rng.random((1, 16, w)).astype(np.float32)
    r_got, U_got = advect_all_pallas(
        0.3, rho, U, flags, 0.6, max_disp=1, block=16, interpret=True,
    )
    r_want = advect_scalar_pallas(
        0.3, rho, U, flags, 0.6, max_disp=1, block=16, interpret=True,
    )
    U_want = advect_velocity_pallas(
        0.3, U, flags, 0.6, max_disp=1, block=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_want),
                               atol=1e-6)


def test_advect_scalar_pallas_line_trace_matches_window(rng):
    """Fused scalar advection WITH the first-hit obstacle trace == the XLA
    window path running the same formulation (interpret mode). This is the
    fast path's reference-semantics mode (ref: fluids_init.cpp:300)."""
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import advect_scalar_pallas

    flags = random_flags(rng, 1, 32, 32, p_obstacle=0.1)
    U = (2.0 * rng.standard_normal((1, 2, 32, 32))).astype(np.float32)
    rho = rng.random((1, 32, 32)).astype(np.float32)
    got = np.asarray(
        advect_scalar_pallas(
            0.3, rho, U, flags, 0.6, max_disp=4, block=16, interpret=True,
            line_trace=True,
        )
    )
    want = np.asarray(
        ops.advect_scalar(
            0.3, rho, U, flags, maccormack_strength=0.6,
            line_trace=True, line_trace_impl="firsthit", impl="window",
            max_disp=4,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_step_pallas_fast_path_matches_xla(monkeypatch):
    """simulate_step(use_pallas=True) == the XLA window path (interpret
    mode; grids must be 128-divisible for the fast path)."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    state = create_plume_scene(128, 128, density_val=0.1, u_scale=2.0,
                               rad=0.145)
    cfg_x = plume_config(jacobi_iter=8, line_trace=False)
    cfg_p = cfg_x.replace(use_pallas=True)
    s_x = simulate_step(cfg_x, state)
    s_p = simulate_step(cfg_p, state)
    np.testing.assert_allclose(
        np.asarray(s_p.U), np.asarray(s_x.U), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_p.density), np.asarray(s_x.density), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_p.p), np.asarray(s_x.p), atol=1e-5
    )


def test_step_merged_advection_matches_separate(monkeypatch):
    """simulate_step with fuse_advection=True == the two-kernel fast path
    (interpret mode) — validates the step-level wiring of
    advect_all_pallas, including correct_scalar ordering."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.sim import create_plume_scene, plume_config, simulate_step

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    state = create_plume_scene(128, 128, density_val=0.1, u_scale=2.0,
                               rad=0.145)
    base = plume_config(jacobi_iter=8, use_pallas=True, line_trace=True,
                        correct_scalar=True)
    s_two = simulate_step(base.replace(fuse_advection=False), state)
    s_one = simulate_step(base.replace(fuse_advection=True), state)
    np.testing.assert_allclose(
        np.asarray(s_one.U), np.asarray(s_two.U), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s_one.density), np.asarray(s_two.density), atol=1e-5
    )


def test_step_merged_advection_viscous_cylinder(monkeypatch):
    """Merged advection through the viscous stick-BC cylinder step — the
    separate-orig (viscous field) path of the step wiring (interpret)."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.sim import (
        create_cylinder_scene,
        cylinder_config,
        simulate_step,
    )

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    state, nu = create_cylinder_scene(res_x=192, res_y=64, center_x=48,
                                      center_y=32, radius=7.5,
                                      inlet_vel=1.0, reynolds=100.0)
    # advect_density=True so the merge gate engages (the reference cylinder
    # batch has no density, but the merged kernel must still be exact when
    # a scalar rides along a viscous velocity field)
    base = cylinder_config(nu, jacobi_iter=6).replace(
        use_pallas=True, advect_density=True
    )
    assert base.viscosity > 0
    s_two = simulate_step(base.replace(fuse_advection=False), state)
    s_one = simulate_step(base.replace(fuse_advection=True), state)
    np.testing.assert_allclose(
        np.asarray(s_one.U), np.asarray(s_two.U), atol=1e-5
    )


def test_jacobi_pallas_warm_start_matches_xla(rng, monkeypatch):
    """p0 warm start (the learned-projection polish path) == XLA p0 path."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.ops.pallas import jacobi_pallas as jp

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    flags = random_flags(rng, 2, 16, 24, p_obstacle=0.1)
    U = rng.standard_normal((2, 2, 16, 24)).astype(np.float32)
    div = np.asarray(ops.velocity_divergence(U, flags))
    p0 = rng.standard_normal(div.shape).astype(np.float32)

    got = np.asarray(jp.solve_jacobi_pallas(flags, div, 12, p0=p0))
    want = np.asarray(ops.solve_jacobi_fixed(flags, div, 12, p0=p0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_advect_scalar3_pallas_matches_window(rng):
    """3-D fused advection kernel == the XLA window path (interpret mode).
    (On real hardware the fused kernel is 8.2-8.4x FASTER than the XLA
    window path at 128^3 on v5e — see RESULTS.md; this test pins its
    bit-correctness against the XLA reference implementation.)"""
    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.ops.pallas.advect3_pallas import (
        advect_scalar3_pallas,
    )

    flags = np.asarray(ops3d.empty_domain3(1, 16, 32, 16))
    U = np.clip(1.5 * rng.standard_normal((1, 3, 16, 32, 16)), -2, 2
                ).astype(np.float32)
    rho = rng.random((1, 16, 32, 16)).astype(np.float32)
    want = np.asarray(ops3d.advect_scalar3(
        0.8, rho, U, flags, 0.6, impl="window", max_disp=2))
    got = np.asarray(advect_scalar3_pallas(
        0.8, rho, U, flags, 0.6, max_disp=2, block_z=8, block_y=16,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_project_tail3_pallas_matches_chain(rng):
    """Fused 3-D projection tail == the unfused XLA chain
    (divergence3 -> warm damped Jacobi -> velocity_update3 ->
    set_wall_bcs3), interpret mode."""
    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.ops.pallas.proj_tail3_pallas import (
        project_tail3_pallas,
    )

    flags = _random_flags3(rng, 2, 8, 16, 16, p_obstacle=0.1)
    U = np.clip(rng.standard_normal((2, 3, 8, 16, 16)), -2, 2
                ).astype(np.float32)
    p0 = rng.standard_normal((2, 8, 16, 16)).astype(np.float32)

    p_got, U_got = project_tail3_pallas(flags, U, p0, iters=9,
                                        damping=6.0 / 7.0, interpret=True)
    div = ops3d.velocity_divergence3(U, flags)
    p_want = ops3d.solve_jacobi_fixed3(flags, div, 9, p0=p0,
                                       damping=6.0 / 7.0)
    U_want = ops3d.set_wall_bcs3(
        ops3d.velocity_update3(p_want, U, flags), flags
    )
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_want),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_want),
                               atol=2e-5)


def test_punet3_fused_tail_matches_pallas_polish(rng, monkeypatch):
    """FluidNet3 with polish_impl='fused' == polish_impl='pallas' (the
    separate polish kernel + XLA update/BC chain), interpret mode."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models.punet3d import FluidNet3, init_params3

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    import dataclasses

    base = ModelConfig(model="PUNet3", polish_sweeps=6,
                       polish_damping=6.0 / 7.0, punet_patch=4,
                       punet_widths=(16, 16))
    flags = _random_flags3(rng, 1, 16, 16, 16, p_obstacle=0.08)
    U = np.clip(rng.standard_normal((1, 3, 16, 16, 16)), -2, 2
                ).astype(np.float32)
    p = np.zeros((1, 16, 16, 16), np.float32)
    rho = rng.random((1, 16, 16, 16)).astype(np.float32)

    outs = {}
    for impl in ("pallas", "fused"):
        cfg = dataclasses.replace(base, polish_impl=impl)
        model = FluidNet3(cfg)
        params = init_params3(model, jax.random.PRNGKey(0), 16, 16, 16)
        outs[impl] = model.apply(params, p, U, flags, rho)
    np.testing.assert_allclose(np.asarray(outs["fused"][0]),
                               np.asarray(outs["pallas"][0]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(outs["fused"][1]),
                               np.asarray(outs["pallas"][1]), atol=2e-5)


def test_advect_all3_pallas_matches_separate_kernels(rng):
    """The merged 3-D scalar+velocity kernel == running the two standalone
    kernels (interpret mode; max_disp=1 keeps the unrolled windows small —
    the kernels are parameterised only by D)."""
    from fluidnet_cxx_tpu.ops.pallas.advect3_pallas import (
        advect_all3_pallas,
        advect_scalar3_pallas,
        advect_velocity3_pallas,
    )

    flags = _random_flags3(rng, 1, 8, 32, 16, p_obstacle=0.08)
    U = np.clip(1.0 * rng.standard_normal((1, 3, 8, 32, 16)), -1, 1
                ).astype(np.float32)
    rho = rng.random((1, 8, 32, 16)).astype(np.float32)
    r_got, U_got = advect_all3_pallas(
        0.8, rho, U, flags, 0.6, max_disp=1, block_z=8, block_y=16,
        interpret=True, line_trace=False,
    )
    r_want = advect_scalar3_pallas(
        0.8, rho, U, flags, 0.6, max_disp=1, block_z=8, block_y=16,
        interpret=True, line_trace=False,
    )
    U_want = advect_velocity3_pallas(
        0.8, U, flags, 0.6, max_disp=1, block_z=8, block_y=16,
        interpret=True,
    )
    # XLA may reassociate float ops differently in the larger fused graph.
    np.testing.assert_allclose(np.asarray(r_got), np.asarray(r_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_want),
                               atol=1e-6)


def test_advect_scalar3_pallas_line_trace_matches_window(rng):
    """3-D fused scalar advection WITH the first-hit trace == the XLA
    window path running the same formulation (interpret mode).

    max_disp=1 keeps the unrolled trace window at 3^3 (the D=2 5^3 graph
    takes >20 min to build in interpret mode on CPU; the kernel is
    parameterised only by D, and the D=2 sampling path is covered by
    test_advect_scalar3_pallas_matches_window)."""
    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.ops.pallas.advect3_pallas import (
        advect_scalar3_pallas,
    )

    flags = _random_flags3(rng, 1, 16, 32, 16, p_obstacle=0.08)
    U = np.clip(1.0 * rng.standard_normal((1, 3, 16, 32, 16)), -1, 1
                ).astype(np.float32)
    rho = rng.random((1, 16, 32, 16)).astype(np.float32)
    want = np.asarray(ops3d.advect_scalar3(
        0.8, rho, U, flags, 0.6, impl="window", max_disp=1,
        line_trace=True, line_trace_impl="firsthit"))
    got = np.asarray(advect_scalar3_pallas(
        0.8, rho, U, flags, 0.6, max_disp=1, block_z=8, block_y=16,
        interpret=True, line_trace=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_advect_velocity3_pallas_matches_window(rng):
    """3-D fused MAC velocity advection kernel == XLA window (interpret)."""
    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.ops.pallas.advect3_pallas import (
        advect_velocity3_pallas,
    )

    flags = np.asarray(ops3d.empty_domain3(1, 16, 32, 16))
    U = np.clip(1.5 * rng.standard_normal((1, 3, 16, 32, 16)), -2, 2
                ).astype(np.float32)
    want = np.asarray(ops3d.advect_velocity3(
        0.8, U, flags, 0.6, impl="window", max_disp=2))
    got = np.asarray(advect_velocity3_pallas(
        0.8, U, flags, 0.6, max_disp=2, block_z=8, block_y=16,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


def _random_flags3(rng, b, d, h, w, p_obstacle=0.1):
    from fluidnet_cxx_tpu.oracle import np_oracle as orc

    flags = np.full((b, d, h, w), orc.FLUID, np.int32)
    flags[:, 0], flags[:, -1] = orc.OBSTACLE, orc.OBSTACLE
    flags[:, :, 0], flags[:, :, -1] = orc.OBSTACLE, orc.OBSTACLE
    flags[:, :, :, 0], flags[:, :, :, -1] = orc.OBSTACLE, orc.OBSTACLE
    r = rng.random((b, d, h, w))
    interior = np.zeros((b, d, h, w), bool)
    interior[:, 1:-1, 1:-1, 1:-1] = True
    flags[(r < p_obstacle) & interior] = orc.OBSTACLE
    return flags


def test_jacobi3_pallas_matches_xla(rng, monkeypatch):
    """Whole-volume VMEM 3-D Jacobi == ops3d.solve_jacobi_fixed3 (interpret
    mode), incl. interior obstacles, warm start, and damping."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.ops.pallas import jacobi3_pallas as jp3

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    flags = _random_flags3(rng, 2, 8, 12, 16, p_obstacle=0.1)
    div = rng.standard_normal((2, 8, 12, 16)).astype(np.float32)

    got = np.asarray(jp3.solve_jacobi3_pallas(flags, div, 25))
    want = np.asarray(ops3d.solve_jacobi_fixed3(flags, div, 25))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # warm start + damping (the learned-projection polish configuration)
    p0 = rng.standard_normal(div.shape).astype(np.float32)
    got = np.asarray(
        jp3.solve_jacobi3_pallas(flags, div, 12, p0=p0, damping=2.0 / 3.0)
    )
    want = np.asarray(
        ops3d.solve_jacobi_fixed3(flags, div, 12, p0=p0, damping=2.0 / 3.0)
    )
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_vmem_fits3():
    from fluidnet_cxx_tpu.ops.pallas.jacobi3_pallas import vmem_fits3

    assert vmem_fits3(128, 128, 128)
    assert not vmem_fits3(256, 256, 256)


def test_mg_pallas_matches_xla(rng, monkeypatch):
    """Fully-fused V-cycle kernel == ops.multigrid.solve_mg (interpret
    mode), incl. interior obstacles and warm start."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.ops import multigrid as mgx
    from fluidnet_cxx_tpu.ops.pallas import mg_pallas as mp

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    flags = random_flags(rng, 2, 32, 32, p_obstacle=0.08)
    U = rng.standard_normal((2, 2, 32, 32)).astype(np.float32)
    div = np.asarray(ops.velocity_divergence(U, flags))

    got = np.asarray(mp.solve_mg_pallas(flags, div, n_vcycles=2))
    want = np.asarray(mgx.solve_mg(flags, div, n_vcycles=2))
    # matmul-based transfers accumulate in a different order than the XLA
    # roll-sums -> ~1e-6 relative noise
    np.testing.assert_allclose(got, want, atol=5e-5)

    # warm start (the closed-loop sim path; p0 zero on obstacles like a
    # previous step's pressure)
    p0 = rng.standard_normal(div.shape).astype(np.float32)
    p0[np.asarray(flags) != 1] = 0.0
    got = np.asarray(mp.solve_mg_pallas(flags, div, n_vcycles=1, p0=p0))
    want = np.asarray(mgx.solve_mg(flags, div, n_vcycles=1, p0=p0))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_pick_block():
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import pick_block

    assert pick_block(512) == 64
    assert pick_block(800) == 40          # largest 8-mult divisor <= 64
    assert 800 % pick_block(800) == 0
    assert pick_block(40) == 40
    assert pick_block(200) == 40
    assert pick_block(7) is None          # nothing divides
    assert pick_block(33) is None


def test_advect_pallas_nonaligned_shape(rng):
    """Fused kernels at a non-128-multiple shape (h=40, w=136): the
    row-block path must equal the XLA window engine (VERDICT r2 item 5 —
    the old gate needlessly forced the reference's 8000x800 cylinder off
    the fast path)."""
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import (
        advect_scalar_pallas,
        advect_velocity_pallas,
        pick_block,
    )

    h, w = 40, 136
    blk = pick_block(h)
    assert blk == 40
    flags = random_flags(rng, 1, h, w, p_obstacle=0.1)
    U = (2.0 * rng.standard_normal((1, 2, h, w))).astype(np.float32)
    rho = rng.random((1, h, w)).astype(np.float32)

    got = np.asarray(advect_velocity_pallas(
        0.3, U, flags, 0.6, max_disp=4, block=blk, interpret=True))
    want = np.asarray(ops.advect_velocity(
        0.3, U, U, flags, maccormack_strength=0.6, impl="window",
        max_disp=4))
    np.testing.assert_allclose(got, want, atol=5e-5)

    got = np.asarray(advect_scalar_pallas(
        0.3, rho, U, flags, 0.6, max_disp=4, block=blk, interpret=True))
    want = np.asarray(ops.advect_scalar(
        0.3, rho, U, flags, maccormack_strength=0.6, line_trace=False,
        impl="window", max_disp=4))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_advect_velocity_pallas_orig(rng):
    """The fused kernel's two-field form (advect the viscous field ``orig``
    by U, ref simulate.py:66-93) == the XLA window path — this is what puts
    the viscous cylinder on the fast path."""
    from fluidnet_cxx_tpu.ops.pallas.advect_pallas import (
        advect_velocity_pallas,
    )

    h, w = 64, 128
    flags = random_flags(rng, 1, h, w, p_obstacle=0.1)
    U = (2.0 * rng.standard_normal((1, 2, h, w))).astype(np.float32)
    orig = (2.0 * rng.standard_normal((1, 2, h, w))).astype(np.float32)

    got = np.asarray(advect_velocity_pallas(
        0.3, U, flags, 0.6, max_disp=4, block=32, interpret=True,
        orig=orig))
    want = np.asarray(ops.advect_velocity(
        0.3, orig, U, flags, maccormack_strength=0.6, impl="window",
        max_disp=4))
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_project_tail_pallas_matches_chain(rng):
    """Fused projection tail == div -> warm damped Jacobi -> velocity_update
    -> set_wall_bcs chain (incl. obstacles and empty cells), and the
    linearity argument: the kernel on un-normalised fields reproduces the
    wrapper's normalise/un-normalise sandwich."""
    from fluidnet_cxx_tpu.ops.jacobi import solve_jacobi_fixed
    from fluidnet_cxx_tpu.ops.pallas.proj_tail_pallas import (
        project_tail_pallas,
    )
    from fluidnet_cxx_tpu.ops.stencils import (
        set_wall_bcs,
        velocity_divergence,
        velocity_update,
    )

    h, w = 32, 48
    flags = np.asarray(random_flags(rng, 2, h, w, p_obstacle=0.1))
    # sprinkle EMPTY cells (type 4) in the interior
    emp = rng.random((2, h, w)) < 0.05
    emp[:, :2] = emp[:, -2:] = emp[:, :, :2] = emp[:, :, -2:] = False
    flags = np.where(emp & (flags == 1), 4, flags).astype(np.int32)
    U = rng.standard_normal((2, 2, h, w)).astype(np.float32)
    p0 = rng.standard_normal((2, h, w)).astype(np.float32)
    p0[flags != 1] = 0.0

    div = velocity_divergence(U, flags)
    p_want = solve_jacobi_fixed(flags, div, 12, p0=p0, damping=2.0 / 3.0)
    U_want = set_wall_bcs(velocity_update(p_want, U, flags), flags)

    p_got, U_got = project_tail_pallas(flags, U, p0, 12, interpret=True)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_want),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_want),
                               atol=2e-5)

    # linearity: wrapper sandwich (normalise by s) == kernel un-normalised
    s = 3.7
    p_n = solve_jacobi_fixed(flags, div / s, 12, p0=p0 / s,
                             damping=2.0 / 3.0)
    U_n = velocity_update(p_n, U / s, flags)
    np.testing.assert_allclose(
        np.asarray(set_wall_bcs(U_n * s, flags)), np.asarray(U_got),
        atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_n) * s, np.asarray(p_got),
                               atol=2e-5)


def test_project_mg_pallas_matches_chain(rng, monkeypatch):
    """Fused MG projection (RHS + warm V-cycle + velocity update + wall
    BCs in one kernel) == the XLA chain."""
    from jax.experimental import pallas as pl

    from fluidnet_cxx_tpu.ops import multigrid as mgx
    from fluidnet_cxx_tpu.ops.pallas import mg_pallas as mp
    from fluidnet_cxx_tpu.ops.stencils import (
        set_wall_bcs,
        velocity_divergence,
        velocity_update,
    )

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    flags = random_flags(rng, 1, 32, 32, p_obstacle=0.08)
    U = rng.standard_normal((1, 2, 32, 32)).astype(np.float32)
    p0 = rng.standard_normal((1, 32, 32)).astype(np.float32)
    p0[np.asarray(flags) != 1] = 0.0

    div = velocity_divergence(U, flags)
    p_want = mgx.solve_mg(flags, div, n_vcycles=1, p0=p0)
    U_want = set_wall_bcs(velocity_update(p_want, U, flags), flags)

    p_got, U_got = mp.project_mg_pallas(flags, U, p0=p0, n_vcycles=1)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_want),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_want),
                               atol=5e-5)


def test_punet_forward_pallas_matches_flax(rng):
    """Fused whole-PUNet forward (one pallas_call of MXU matmuls) == the
    flax PUNet at the flagship architecture (patch 8, widths (96,128,128),
    dilated bottleneck), f32 compute, interpret mode."""
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models.punet import PUNet
    from fluidnet_cxx_tpu.ops.pallas.punet_pallas import make_punet_apply

    cfg = ModelConfig(
        model="PUNet", punet_patch=8, punet_widths=(96, 128, 128),
        punet_level_convs=1, punet_bottleneck_convs=3,
        punet_bottleneck_dilation=2, punet_refine_convs=0,
    )
    h = w = 128
    net = PUNet(patch=8, widths=(96, 128, 128), level_convs=1,
                bottleneck_convs=3, bottleneck_dilation=2, refine_convs=0,
                dtype="float32")
    x = jnp.asarray(rng.standard_normal((2, h, w, 2)), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x)
    want = np.asarray(net.apply(params, x))

    fwd = make_punet_apply(cfg, params["params"], h, w, interpret=True,
                           compute_dtype=jnp.float32)
    got = np.asarray(fwd(x))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_project_fn_fused_forward_matches_flax(rng, monkeypatch):
    """make_project_fn_fused_forward == make_project_fn on the full learned
    projection (assemble -> forward -> fused tail), interpret mode."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models import (
        FluidNet,
        init_params,
        make_project_fn,
        make_project_fn_fused_forward,
    )

    cfg = ModelConfig(
        model="PUNet", punet_patch=8, punet_widths=(96, 128),
        punet_level_convs=1, punet_bottleneck_convs=2,
        punet_bottleneck_dilation=1, punet_refine_convs=0,
        polish_sweeps=4, polish_impl="fused",
    )
    h = w = 64
    model = FluidNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), h, w)

    flags = random_flags(rng, 1, h, w, p_obstacle=0.0)
    p = jnp.asarray(rng.standard_normal((1, h, w)), jnp.float32)
    U = jnp.asarray(rng.standard_normal((1, 2, h, w)), jnp.float32)
    rho = jnp.asarray(rng.standard_normal((1, h, w)), jnp.float32)

    p_ref, U_ref = make_project_fn(model, params)(p, U, flags, rho)
    p_got, U_got = make_project_fn_fused_forward(
        model, params, h, w, compute_dtype=jnp.float32)(p, U, flags, rho)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_ref),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_ref),
                               atol=2e-4)


def test_project_tail_vmem_gate_falls_back(rng, monkeypatch):
    """Above the VMEM budget the fused tails must route to the unfused
    chain with identical semantics (the 128^3 learned row Mosaic-OOMed on
    v5e before this gate — docs/results/bench3d_r4_punet3.log)."""
    import fluidnet_cxx_tpu.ops.pallas.proj_tail3_pallas as pt3
    import fluidnet_cxx_tpu.ops.pallas.proj_tail_pallas as pt2
    from fluidnet_cxx_tpu.ops import ops3d
    from fluidnet_cxx_tpu.ops.jacobi import solve_jacobi_fixed
    from fluidnet_cxx_tpu.ops.stencils import (
        set_wall_bcs,
        velocity_divergence,
        velocity_update,
    )

    # 2-D: tiny budget forces the gate at a small shape.
    h, w = 16, 32
    flags = np.asarray(random_flags(rng, 1, h, w, p_obstacle=0.1))
    U = rng.standard_normal((1, 2, h, w)).astype(np.float32)
    p0 = rng.standard_normal((1, h, w)).astype(np.float32)
    p0[flags != 1] = 0.0
    monkeypatch.setattr(pt2, "FUSED_TAIL_VMEM_BUDGET", 1)
    p_got, U_got = pt2.project_tail_pallas(flags, U, p0, 7,
                                           damping=2.0 / 3.0,
                                           interpret=True)
    div = velocity_divergence(U, flags)
    p_want = solve_jacobi_fixed(flags, div, 7, p0=p0, damping=2.0 / 3.0)
    U_want = set_wall_bcs(velocity_update(p_want, U, flags), flags)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_want),
                               atol=1e-6)

    # 3-D twin.
    flags3 = _random_flags3(rng, 1, 8, 8, 16, p_obstacle=0.1)
    U3 = rng.standard_normal((1, 3, 8, 8, 16)).astype(np.float32)
    p03 = rng.standard_normal((1, 8, 8, 16)).astype(np.float32)
    monkeypatch.setattr(pt3, "FUSED_TAIL_VMEM_BUDGET", 1)
    p3_got, U3_got = pt3.project_tail3_pallas(flags3, U3, p03, 5,
                                              damping=6.0 / 7.0,
                                              interpret=True)
    div3 = ops3d.velocity_divergence3(U3, flags3)
    p3_want = ops3d.solve_jacobi_fixed3(flags3, div3, 5, p0=p03,
                                        damping=6.0 / 7.0)
    U3_want = ops3d.set_wall_bcs3(
        ops3d.velocity_update3(p3_want, U3, flags3), flags3)
    np.testing.assert_allclose(np.asarray(p3_got), np.asarray(p3_want),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(U3_got), np.asarray(U3_want),
                               atol=1e-6)


def test_punet3_forward_pallas_matches_flax(rng):
    """Fused whole-PUNet3 forward (one pallas_call, 27-tap shifted-matmul
    convs) == the flax PUNet3 at the 3-D flagship architecture (patch 4,
    widths (96, 128)), f32 compute, interpret mode (VERDICT r4 item 4)."""
    import jax.numpy as jnp

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models.punet3d import PUNet3
    from fluidnet_cxx_tpu.ops.pallas.punet3_pallas import make_punet3_apply

    cfg = ModelConfig(
        model="PUNet3", punet_patch=4, punet_widths=(96, 128),
        punet_level_convs=1, punet_bottleneck_convs=2,
        punet_bottleneck_dilation=1, punet_refine_convs=0,
    )
    d = h = w = 16
    net = PUNet3(patch=4, widths=(96, 128), level_convs=1,
                 bottleneck_convs=2, dtype="float32")
    x = jnp.asarray(rng.standard_normal((2, d, h, w, 2)), jnp.float32)
    params = net.init(jax.random.PRNGKey(1), x)
    want = np.asarray(net.apply(params, x))

    fwd = make_punet3_apply(cfg, params["params"], d, h, w, interpret=True,
                            compute_dtype=jnp.float32)
    got = np.asarray(fwd(x))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_project_fn3_fused_forward_matches_flax(rng, monkeypatch):
    """make_project_fn3_fused_forward == make_project_fn3 on the full 3-D
    learned projection (assemble -> fused forward -> fused tail),
    interpret mode."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models import (
        FluidNet3,
        init_params3,
        make_project_fn3,
        make_project_fn3_fused_forward,
    )
    from fluidnet_cxx_tpu.ops import ops3d

    cfg = ModelConfig(
        model="PUNet3", punet_patch=4, punet_widths=(96, 128),
        punet_level_convs=1, punet_bottleneck_convs=2,
        punet_refine_convs=0, polish_sweeps=4, polish_impl="fused",
        compute_dtype="float32",
    )
    d = h = w = 16
    model = FluidNet3(cfg)
    params = init_params3(model, jax.random.PRNGKey(0), d, h, w)

    flags = ops3d.empty_domain3(1, d, h, w)
    U = jnp.asarray(0.3 * rng.standard_normal((1, 3, d, h, w)), jnp.float32)
    p = jnp.zeros((1, d, h, w), jnp.float32)
    rho = jnp.zeros((1, d, h, w), jnp.float32)

    p_want, U_want = make_project_fn3(model, params)(p, U, flags, rho)
    p_got, U_got = make_project_fn3_fused_forward(
        model, params, d, h, w, compute_dtype=jnp.float32)(p, U, flags, rho)
    np.testing.assert_allclose(np.asarray(p_got), np.asarray(p_want),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(U_got), np.asarray(U_want),
                               atol=2e-4)


def test_step_inlet_folded_projection_matches_unfused(rng, monkeypatch):
    """The inlet-folded convnet step (const BCs applied inside the fused
    tail, scale inside the kernels — VERDICT r4 item 2) == the reference
    composition (apply_const_vals -> project -> apply_const_vals) on a
    plume scene with live inlet masks, interpret mode."""
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    orig = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    from fluidnet_cxx_tpu.config import ModelConfig
    from fluidnet_cxx_tpu.models import (
        FluidNet,
        init_params,
        make_project_fn,
        make_project_fn_fused_forward,
    )
    from fluidnet_cxx_tpu.sim import (
        create_plume_scene,
        plume_config,
        simulate_step,
    )

    cfg_m = ModelConfig(
        model="PUNet", punet_patch=8, punet_widths=(96, 128),
        punet_level_convs=1, punet_bottleneck_convs=2,
        punet_refine_convs=0, polish_sweeps=4, polish_impl="fused",
        compute_dtype="float32",
    )
    res = 128
    model = FluidNet(cfg_m)
    params = init_params(model, jax.random.PRNGKey(0), res, res)

    state = create_plume_scene(res, res, density_val=0.1, u_scale=2.0,
                               rad=0.145)
    assert state.U_bc is not None  # the test needs live inlet masks
    cfg = plume_config(sim_method="convnet", use_pallas=False,
                       line_trace=False)

    # a few warmup steps so fields are non-trivial
    import dataclasses

    proj_ref = make_project_fn(model, params)
    for _ in range(3):
        state = simulate_step(cfg, state, project_fn=proj_ref)

    want = simulate_step(cfg, state, project_fn=proj_ref)

    proj_fused = make_project_fn_fused_forward(
        model, params, res, res, compute_dtype=jnp.float32)
    assert proj_fused.handles_const_vals
    got = simulate_step(cfg, state, project_fn=proj_fused)

    np.testing.assert_allclose(np.asarray(got.p), np.asarray(want.p),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.U), np.asarray(want.U),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.density),
                               np.asarray(want.density), atol=2e-4)
