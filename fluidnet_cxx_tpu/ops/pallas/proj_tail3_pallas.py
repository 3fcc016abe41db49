"""Fused 3-D learned-projection tail (Pallas TPU kernel).

3-D twin of proj_tail_pallas.py: after the PUNet3 head produces a coarse
pressure, run divergence RHS, warm damped-Jacobi polish sweeps, the
pressure-gradient velocity update and the free-slip wall BCs in ONE
pallas_call with every field VMEM-resident — at 128^3 each of those ops
is an ~8 MB x N-field HBM round-trip as separate XLA ops.

Layout: the volume rides the jacobi3_pallas (d*h, w) z-major 2-D view —
x+-1 = lane shift, y+-1 = row shift by 1, z+-1 = row shift by h; wrap rows
land only in border cells, which every stage masks (the domains carry an
OBSTACLE border ring). The polish uses the cnt-folded obstacle-Neumann
identity (see jacobi3_pallas docstring) with cont/cnt built in-kernel.

Semantics matched (reference-cited in ops/ops3d.py):
* RHS: ops3d.velocity_divergence3 (Manta makeRhs sign).
* sweeps: ops3d.solve_jacobi_fixed3 warm start + damping.
* update: ops3d.velocity_update3 (Bridson fluid/empty BCs, border faces
  untouched).
* wall BCs: ops3d.set_wall_bcs3 (index clamped at 0).
Verified against the unfused chain in tests/test_pallas.py.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...celltype import EMPTY, FLUID, OBSTACLE
from .jacobi3_pallas import _cshift, _rshift

F32 = jnp.float32
I32 = jnp.int32

# Whole-volume-resident kernel: 5 aliased windows + ~9 live temps must fit
# VMEM; above this budget project_tail3_pallas falls back to the unfused
# chain (at 128^3 the fused compile exceeds v5e VMEM — measured, see
# docs/results/bench3d_r4_punet3.log). Tests patch this constant.
FUSED_TAIL_VMEM_BUDGET = 110 * 1024 * 1024


def _tail3_kernel(flags_ref, u_ref, v_ref, w_ref, p0_ref,
                  p_out_ref, u_out_ref, v_out_ref, w_out_ref,
                  *, iters, damping, d, h, w):
    flags = flags_ref[0]
    u = u_ref[0]
    v = v_ref[0]
    wz = w_ref[0]

    flf = jnp.where(flags == float(FLUID), 1.0, 0.0)
    obf = jnp.where(flags == float(OBSTACLE), 1.0, 0.0)
    emf = jnp.where(flags == float(EMPTY), 1.0, 0.0)
    fl = flf > 0.5
    ob = obf > 0.5
    em = emf > 0.5

    rows, _ = flags.shape
    rr = jax.lax.broadcasted_iota(I32, flags.shape, 0)
    xx = jax.lax.broadcasted_iota(I32, flags.shape, 1)
    zz = rr // h
    yy = rr - zz * h
    interior = (
        (xx >= 1) & (xx <= w - 2)
        & (yy >= 1) & (yy <= h - 2)
        & (zz >= 1) & (zz <= d - 2)
    )

    # x/y/z neighbour shifts in the flat view (wrap rows only feed border
    # cells, masked everywhere below).
    def sx(a, s):  # x + s
        return _cshift(a, s)

    def sy(a, s):  # y + s
        return _rshift(a, s)

    def sz(a, s):  # z + s
        return _rshift(a, s * h)

    # 1. RHS (ops3d.velocity_divergence3).
    rhs = (u - sx(u, 1)) + (v - sy(v, 1)) + (wz - sz(wz, 1))
    rhs = jnp.where(interior & (~ob), rhs, 0.0)

    # 2. Warm damped-Jacobi polish, cnt-folded (jacobi3_pallas identity:
    # exact because p is pinned to 0 on obstacle cells every sweep).
    cont = jnp.where(interior & (~ob), 1.0, 0.0)
    cnt = (sx(obf, -1) + sx(obf, 1) + sy(obf, -1) + sy(obf, 1)
           + sz(obf, -1) + sz(obf, 1))
    p0 = jnp.where(ob, 0.0, p0_ref[0])

    def sweep(_, p):
        acc = rhs + cnt * p
        acc = acc + sx(p, -1) + sx(p, 1)
        acc = acc + sy(p, -1) + sy(p, 1)
        acc = acc + sz(p, -1) + sz(p, 1)
        upd = acc * (1.0 / 6.0)
        if damping != 1.0:
            upd = (1.0 - damping) * p + damping * upd
        return cont * upd

    p = jax.lax.fori_loop(0, iters, sweep, p0)

    # 3. Velocity update (ops3d.velocity_update3); border faces untouched.
    outs = []
    for vel, sm in ((u, lambda a: sx(a, -1)),
                    (v, lambda a: sy(a, -1)),
                    (wz, lambda a: sz(a, -1))):
        fm = sm(flf) > 0.5
        e_m = sm(emf) > 0.5
        p_m = sm(p)
        new = jnp.where(
            fl & fm, vel - (p - p_m),
            jnp.where(fl & e_m, vel - p,
                      jnp.where(em & fm, vel + p_m, 0.0)),
        )
        outs.append(jnp.where(interior, new, vel))

    # 4. Free-slip wall BCs (ops3d.set_wall_bcs3, index clamped at 0).
    contw = fl | ob
    idx = (xx, yy, zz)
    shifts = (lambda a: sx(a, -1), lambda a: sy(a, -1), lambda a: sz(a, -1))
    for c in range(3):
        clamp = lambda a: jnp.where(idx[c] == 0, a, shifts[c](a))
        ob_m = clamp(obf) > 0.5
        fl_m = clamp(flf) > 0.5
        kill = contw & (ob_m | (ob & fl_m))
        outs[c] = jnp.where(kill, 0.0, outs[c])

    p_out_ref[0] = p
    u_out_ref[0] = outs[0]
    v_out_ref[0] = outs[1]
    w_out_ref[0] = outs[2]


def project_tail3_pallas(flags, U, p0, iters: int,
                         damping: float = 6.0 / 7.0,
                         interpret: bool = False):
    """Fused 3-D projection tail. flags (b,d,h,w) i32, U (b,3,d,h,w) f32
    divergent, ``p0`` (b,d,h,w) f32 warm-start pressure. Returns
    (p, U') == the unfused chain:
      div = ops3d.velocity_divergence3(U, flags)
      p   = ops3d.solve_jacobi_fixed3(flags, div, iters, p0=p0,
                                      damping=damping)
      U'  = ops3d.set_wall_bcs3(ops3d.velocity_update3(p, U, flags), flags)
    """
    b, d, h, w = p0.shape

    # VMEM gate: the kernel is whole-volume-resident (5 aliased windows +
    # ~9 live full-volume temps). At 128^3 a window is 8 MB and the total
    # exceeds the chip's VMEM — Mosaic rejects the compile (observed on
    # v5e, docs/results/bench3d_r4_punet3.log). Fall back to the exact
    # unfused chain (same semantics, jacobi3_pallas sweeps) above budget.
    per_buf = d * h * w * 4
    if per_buf * 14 > FUSED_TAIL_VMEM_BUDGET:
        from .. import ops3d

        from .jacobi3_pallas import vmem_fits3

        div = ops3d.velocity_divergence3(U, flags)
        if interpret or not vmem_fits3(d, h, w):
            p = ops3d.solve_jacobi_fixed3(flags, div, iters, p0=p0,
                                          damping=damping)
        else:
            from .jacobi3_pallas import solve_jacobi3_pallas

            p = solve_jacobi3_pallas(flags, div, iters, p0=p0,
                                     damping=damping)
        U_new = ops3d.set_wall_bcs3(
            ops3d.velocity_update3(p, U, flags), flags)
        return p, U_new

    flat = lambda a: a.reshape(b, d * h, w)
    args = (flat(flags.astype(F32)), flat(U[:, 0]), flat(U[:, 1]),
            flat(U[:, 2]), flat(p0))

    kernel = partial(_tail3_kernel, iters=iters, damping=float(damping),
                     d=d, h=h, w=w)
    block = lambda: pl.BlockSpec((1, d * h, w), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    p, u_o, v_o, w_o = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, d * h, w), F32)] * 4,
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[block() for _ in range(5)],
            out_specs=[block() for _ in range(4)],
        ),
        # u/v/w/p0 inputs alias the outputs: all loads happen before the
        # final stores, and sharing the windows saves 4 full-volume VMEM
        # buffers (32 MB at 128^3).
        input_output_aliases={1: 1, 2: 2, 3: 3, 4: 0},
        cost_estimate=pl.CostEstimate(
            flops=(14 * iters + 60) * b * d * h * w,
            bytes_accessed=9 * b * d * h * w * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    unflat = lambda a: a.reshape(b, d, h, w)
    return unflat(p), jnp.stack(
        [unflat(u_o), unflat(v_o), unflat(w_o)], axis=1
    )
