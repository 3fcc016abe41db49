"""Fused learned-projection tail (Pallas TPU kernel).

After the PUNet head produces a coarse pressure, the projection finishes
with: divergence (RHS), warm-started damped-Jacobi polish sweeps, the
pressure-gradient velocity update, and the free-slip wall BCs
(models/fluidnet.py:150-176; reference chain pytorch/lib/model.py:213-227).
As separate XLA ops each of those is an HBM round-trip (~5-10 us at 512^2)
plus dispatch — together they cost more than the polish itself. This kernel
runs the entire tail in ONE pallas_call with every field VMEM-resident.

Linearity note: the wrapper's normalisation (rhs = div/s, polish on the
normalised p_hat, un-scale at the end — model.py:221-223) commutes with the
whole tail because sweeps and velocity_update are linear in (p, rhs) and
every mask is scale-free, so the kernel works on UNNORMALISED fields with
``p0 = p_hat * s`` and produces the final (p_out, U_out) directly.
Verified against the unfused chain in tests/test_pallas.py.

Semantics matched (all reference-cited in ops/stencils.py):
* divergence: ops.stencils.velocity_divergence (Manta makeRhs sign).
* sweeps: ops.jacobi.solve_jacobi_fixed warm start + damping
  (obstacle-Neumann substitution, border/obstacle pinned to 0).
* update: ops.stencils.velocity_update (Bridson p.44 fluid/empty BCs,
  border faces untouched).
* wall BCs: ops.stencils.set_wall_bcs (index clamped at 0).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...celltype import EMPTY, FLUID, OBSTACLE
from .jacobi_pallas import _shift

F32 = jnp.float32

# Whole-grid-resident kernel: 4 aliased windows + ~8 live full-grid temps
# must fit VMEM; above this budget project_tail_pallas falls back to the
# unfused chain (tests patch this to force the gate at small shapes).
FUSED_TAIL_VMEM_BUDGET = 110 * 1024 * 1024


def _clamp_shift_m(a, axis, yy, xx):
    """Left/down neighbour with the index CLAMPED at 0 (set_wall_bcs
    semantics: i_l = max(i-1, 0)). Implemented as circular shift + first
    row/col fix-up — 1-wide lane/sublane slices force Mosaic layouts that
    cannot be sliced at non-128-multiple widths."""
    if axis == 1:  # x-1
        return jnp.where(xx == 0, a, _shift(a, 0, -1))
    return jnp.where(yy == 0, a, _shift(a, -1, 0))


def _tail_kernel(flags_ref, u_ref, v_ref, p0_ref, *rest,
                 iters, damping, has_scale, has_inlet):
    # Loads are direct ``ref[0]`` (b-major block) — a ``.at[0]`` ref view
    # is a memref_slice Mosaic cannot form at non-128-multiple widths
    # (lane-padded buffer, unaligned slice). flags arrive as f32: cell-type
    # values are tiny integers, exact in f32.
    #
    # Optional folds (VERDICT r4 item 2 — the learned projection's XLA
    # glue): ``has_scale`` scales the warm start by the normalisation s
    # in-kernel (drops the p_hat*s3 XLA pass); ``has_inlet`` applies the
    # inlet/const BCs (x*inv_mask + bc) to the input velocity and
    # re-applies them on the output (drops BOTH apply_const_vals XLA
    # passes around the projection — measured 74 us of convnet glue,
    # docs/results/proj_breakdown_r5_20260819_102722.json).
    ridx = 0
    if has_scale:
        s_ref = rest[ridx]
        ridx += 1
    if has_inlet:
        bcu_ref, bcv_ref, imu_ref, imv_ref = rest[ridx:ridx + 4]
        ridx += 4
    p_out_ref, u_out_ref, v_out_ref = rest[ridx:ridx + 3]
    h, w = flags_ref.shape[1:]
    flags = flags_ref[0]
    u = u_ref[0]
    v = v_ref[0]
    if has_inlet:
        imu = imu_ref[0]
        imv = imv_ref[0]
        bcu = bcu_ref[0]
        bcv = bcv_ref[0]
        u = u * imu + bcu
        v = v * imv + bcv

    flf = jnp.where(flags == float(FLUID), 1.0, 0.0)   # f32 masks: Mosaic
    obf = jnp.where(flags == float(OBSTACLE), 1.0, 0.0)  # dislikes i1
    emf = jnp.where(flags == float(EMPTY), 1.0, 0.0)
    fl = flf > 0.5
    ob = obf > 0.5
    em = emf > 0.5

    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (xx < 1) | (xx > w - 2) | (yy < 1) | (yy > h - 2)
    interior = ~border

    # 1. RHS (minus divergence, Manta makeRhs).
    rhs = (u - _shift(u, 0, 1)) + (v - _shift(v, 1, 0))
    rhs = jnp.where(interior & (~ob), rhs, 0.0)

    # 2. Warm-started damped-Jacobi polish (== jacobi_pallas sweeps).
    cont = interior & (~ob)
    ob_xm = _shift(obf, 0, -1) > 0.5
    ob_xp = _shift(obf, 0, 1) > 0.5
    ob_ym = _shift(obf, -1, 0) > 0.5
    ob_yp = _shift(obf, 1, 0) > 0.5

    def sweep(_, p):
        p1 = jnp.where(ob_xm, p, _shift(p, 0, -1))
        p2 = jnp.where(ob_xp, p, _shift(p, 0, 1))
        p3 = jnp.where(ob_ym, p, _shift(p, -1, 0))
        p4 = jnp.where(ob_yp, p, _shift(p, 1, 0))
        upd = (p1 + p2 + p3 + p4 + rhs) * 0.25
        if damping != 1.0:
            upd = (1.0 - damping) * p + damping * upd
        return jnp.where(cont, upd, 0.0)

    p0 = p0_ref[0]
    if has_scale:
        p0 = p0 * s_ref[0, 0]
    p = jax.lax.fori_loop(0, iters, sweep, p0)

    # 3. Velocity update (Bridson BCs; border faces untouched). The wrapped
    # neighbour at x=0/y=0 only feeds border faces, which are overwritten.
    fl_xm = _shift(flf, 0, -1) > 0.5
    em_xm = _shift(emf, 0, -1) > 0.5
    fl_ym = _shift(flf, -1, 0) > 0.5
    em_ym = _shift(emf, -1, 0) > 0.5
    p_xm = _shift(p, 0, -1)
    p_ym = _shift(p, -1, 0)
    u_new = jnp.where(
        fl & fl_xm, u - (p - p_xm),
        jnp.where(fl & em_xm, u - p, jnp.where(em & fl_xm, u + p_xm, 0.0)),
    )
    v_new = jnp.where(
        fl & fl_ym, v - (p - p_ym),
        jnp.where(fl & em_ym, v - p, jnp.where(em & fl_ym, v + p_ym, 0.0)),
    )
    u_new = jnp.where(interior, u_new, u)
    v_new = jnp.where(interior, v_new, v)

    # 4. Free-slip wall BCs (index clamped at 0).
    contw = fl | ob
    ob_xm_c = _clamp_shift_m(obf, 1, yy, xx) > 0.5
    fl_xm_c = _clamp_shift_m(flf, 1, yy, xx) > 0.5
    ob_ym_c = _clamp_shift_m(obf, 0, yy, xx) > 0.5
    fl_ym_c = _clamp_shift_m(flf, 0, yy, xx) > 0.5
    kill_u = contw & (ob_xm_c | (ob & fl_xm_c))
    kill_v = contw & (ob_ym_c | (ob & fl_ym_c))

    u_new = jnp.where(kill_u, 0.0, u_new)
    v_new = jnp.where(kill_v, 0.0, v_new)
    if has_inlet:
        u_new = u_new * imu + bcu
        v_new = v_new * imv + bcv
    p_out_ref[0] = p
    u_out_ref[0] = u_new
    v_out_ref[0] = v_new


def project_tail_pallas(flags, U, p0, iters: int,
                        damping: float = 2.0 / 3.0, interpret: bool = False,
                        scale=None, U_bc=None, U_bc_inv_mask=None):
    """Fused projection tail. flags (b,h,w) i32, U (b,2,h,w) f32 divergent,
    ``p0`` (b,h,w) f32 warm-start pressure (CNN head output, un-normalised).
    Returns (p, U') == the unfused chain:
      [U = U * U_bc_inv_mask + U_bc]            (if inlet args given)
      div = velocity_divergence(U, flags)
      p   = solve_jacobi_fixed(flags, div, iters, p0=p0*scale, damping=...)
      U'  = set_wall_bcs(velocity_update(p, U, flags), flags)
      [U' = U' * U_bc_inv_mask + U_bc]          (if inlet args given)
    ``scale`` (b,) optional: the normalisation s folded in-kernel.
    ``U_bc``/``U_bc_inv_mask`` (b,2,h,w) optional: inlet/const BCs folded
    in-kernel (both applications).
    """
    b, h, w = p0.shape
    has_scale = scale is not None
    has_inlet = U_bc is not None

    # VMEM gate (same rationale as proj_tail3_pallas): whole-grid-resident
    # kernel, 4 aliased windows + ~8 live full-grid temps. Above budget
    # (e.g. the 8000x800 cylinder: 25.6 MB/buffer) fall back to the exact
    # unfused chain rather than fail the Mosaic compile.
    per_buf = h * w * 4
    if per_buf * (12 + 4 * has_inlet) > FUSED_TAIL_VMEM_BUDGET:
        from ..stencils import (set_wall_bcs, velocity_divergence,
                                velocity_update)

        from .jacobi_pallas import vmem_fits

        if has_inlet:
            U = U * U_bc_inv_mask + U_bc
        if has_scale:
            p0 = p0 * scale[:, None, None]
        div = velocity_divergence(U, flags)
        if interpret or not vmem_fits(h, w):
            from ..jacobi import solve_jacobi_fixed

            p = solve_jacobi_fixed(flags, div, iters, p0=p0,
                                   damping=damping)
        else:
            from .jacobi_pallas import solve_jacobi_pallas

            p = solve_jacobi_pallas(flags, div, iters, p0=p0,
                                    damping=damping)
        U = set_wall_bcs(velocity_update(p, U, flags), flags)
        if has_inlet:
            U = U * U_bc_inv_mask + U_bc
        return p, U

    kernel = partial(_tail_kernel, iters=iters, damping=float(damping),
                     has_scale=has_scale, has_inlet=has_inlet)

    def block():
        return pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    args = [flags.astype(F32), U[:, 0], U[:, 1], p0]
    in_specs = [block() for _ in range(4)]
    if has_scale:
        args.append(scale.reshape(b, 1).astype(F32))
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (i, 0),
                                     memory_space=pltpu.SMEM))
    if has_inlet:
        args += [U_bc[:, 0], U_bc[:, 1],
                 U_bc_inv_mask[:, 0], U_bc_inv_mask[:, 1]]
        in_specs += [block() for _ in range(4)]

    p, u_o, v_o = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, h, w), F32)] * 3,
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=in_specs,
            out_specs=[block() for _ in range(3)],
        ),
        cost_estimate=pl.CostEstimate(
            flops=(10 * iters + 30) * b * h * w,
            bytes_accessed=(7 + 4 * has_inlet) * b * h * w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return p, jnp.stack([u_o, v_o], axis=1)
