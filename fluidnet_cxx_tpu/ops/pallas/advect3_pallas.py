"""Fused 3-D MacCormack scalar advection (Pallas TPU kernel, window
semantics, D=2).

3-D twin of advect_pallas.py: holds a (z, y)-tile of (src, u, v, w, flags)
in VMEM and runs the whole pipeline — centred-velocity resampling, forward
& backward trilinear window sampling, MacCormack correction,
3^3-fluid-neighbourhood clamp — on-chip, one HBM round trip per field.
Bit-exact vs ops.ops3d.advect_scalar3(impl='window', line_trace=False)
(interpret-mode test + measured diff 0.0 on v5e at 128^3).

**Measured (v5e, 128^3, marginal over chained scans): 4.6 ms vs 38.6 ms
for the XLA window path — 8.4x.** (Benchmark trap for posterity: a naive
per-call loop that passes host numpy arrays re-uploads ~33 MB through the
remote tunnel every call and measures ~1.2 s for BOTH variants.)

Tiling: grid over (batch, z-blocks, y-blocks); each program DMAs its tile
plus ``halo`` planes/rows of every field from HBM, computes, and writes
the interior. Valid while per-axis displacements stay <= D and the
back-trace stays within the halo (same CFL contract as the 2-D kernel).
The single-(z,y-block) variant OOMs VMEM at 128^3 (register spills of the
unrolled window temporaries); (block_z=8, block_y=32) fits comfortably.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...celltype import FLUID

F32 = jnp.float32
I32 = jnp.int32


def _shift3(a, dz: int, dy: int, dx: int):
    """a[(z+dz)%, (y+dy)%, (x+dx)%] via concat rolls (no gathers)."""
    if dz:
        a = jnp.concatenate([a[dz:], a[:dz]], axis=0)
    if dy:
        a = jnp.concatenate([a[:, dy:], a[:, :dy]], axis=1)
    if dx:
        a = jnp.concatenate([a[:, :, dx:], a[:, :, :dx]], axis=2)
    return a


def _iotas(shape, z0, y0):
    zz = jax.lax.broadcasted_iota(I32, shape, 0) + z0
    yy = jax.lax.broadcasted_iota(I32, shape, 1) + y0
    xx = jax.lax.broadcasted_iota(I32, shape, 2)
    return zz, yy, xx


def _border_zero3(a, z0, y0, d, h, w, bnd=1):
    zz, yy, xx = _iotas(a.shape, z0, y0)
    keep = (
        (xx >= bnd) & (xx <= w - 1 - bnd)
        & (yy >= bnd) & (yy <= h - 1 - bnd)
        & (zz >= bnd) & (zz <= d - 1 - bnd)
    )
    return jnp.where(keep, a, 0.0)


def _interpol_window3_tile(src, px, py, pz, D, z0, y0, d, h, w):
    """Trilinear window sample on an extended (z, y)-tile; positions are
    ABSOLUTE grid coordinates."""
    zz, yy, xx = _iotas(src.shape, z0, y0)
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    cz = zz.astype(F32) + 0.5
    px = jnp.clip(px, cx - D, cx + D) - 0.5
    py = jnp.clip(py, cy - D, cy + D) - 0.5
    pz = jnp.clip(pz, cz - D, cz + D) - 0.5
    x0 = jnp.trunc(px).astype(I32)
    y0 = jnp.trunc(py).astype(I32)
    zi0 = jnp.trunc(pz).astype(I32)
    s1 = jnp.clip(px - x0.astype(F32), 0.0, 1.0)
    t1 = jnp.clip(py - y0.astype(F32), 0.0, 1.0)
    f1 = jnp.clip(pz - zi0.astype(F32), 0.0, 1.0)
    ox0 = jnp.clip(x0, 0, w - 2) - xx
    oy0 = jnp.clip(y0, 0, h - 2) - yy
    oz0 = jnp.clip(zi0, 0, d - 2) - zz
    s0, t0, f0 = 1.0 - s1, 1.0 - t1, 1.0 - f1

    out = jnp.zeros_like(src)
    for oz in range(-D, D + 2):
        wz = f0 * (oz0 == oz) + f1 * (oz0 == oz - 1)
        plane = jnp.zeros_like(src)
        for oy in range(-D, D + 2):
            wy = t0 * (oy0 == oy) + t1 * (oy0 == oy - 1)
            row = jnp.zeros_like(src)
            for ox in range(-D, D + 2):
                wx = s0 * (ox0 == ox) + s1 * (ox0 == ox - 1)
                row = row + wx * _shift3(src, oz, oy, ox)
            plane = plane + wy * row
        out = out + wz * plane
    return out


def _clamp_bounds3_tile(src, fl, px, py, pz, D, z0, y0, d, h, w):
    """min/max/found over fluid cells in the 3^3 neighbourhood of the cell
    containing (px,py,pz) (matches window3.clamp_bounds_scalar_window3)."""
    zz, yy, xx = _iotas(src.shape, z0, y0)
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    cz = zz.astype(F32) + 0.5
    px = jnp.clip(px, cx - D, cx + D)
    py = jnp.clip(py, cy - D, cy + D)
    pz = jnp.clip(pz, cz - D, cz + D)
    i0 = jnp.clip(jnp.trunc(px).astype(I32), 0, w - 1) - xx
    j0 = jnp.clip(jnp.trunc(py).astype(I32), 0, h - 1) - yy
    k0 = jnp.clip(jnp.trunc(pz).astype(I32), 0, d - 1) - zz

    minv = jnp.full_like(src, jnp.inf)
    maxv = jnp.full_like(src, -jnp.inf)
    n = jnp.zeros_like(src)
    R = D + 1
    for oz in range(-R, R + 1):
        mz = (jnp.abs(k0 - oz) <= 1) & (zz + oz >= 0) & (zz + oz < d)
        for oy in range(-R, R + 1):
            my = (
                mz & (jnp.abs(j0 - oy) <= 1)
                & (yy + oy >= 0) & (yy + oy < h)
            )
            for ox in range(-R, R + 1):
                m = (
                    my & (jnp.abs(i0 - ox) <= 1)
                    & (xx + ox >= 0) & (xx + ox < w)
                    & (_shift3(fl, oz, oy, ox) > 0.5)
                )
                s = _shift3(src, oz, oy, ox)
                minv = jnp.where(m, jnp.minimum(minv, s), minv)
                maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
                n = n + jnp.where(m, 1.0, 0.0)
    return n >= 0.5, minv, maxv


def _line_trace_tile3(px0, py0, pz0, dxv, dyv, dzv, blockedf, D, z0, y0,
                      d, h, w):
    """Continuous first-hit obstacle trace on an extended (z, y)-tile —
    3-D twin of advect_pallas._line_trace_tile (same maths as
    line_trace3.line_trace_firsthit3)."""
    from ..line_trace import (
        EPSILON,
        HIT_MARGIN,
        firsthit_axis_slabs,
        firsthit_border_t,
    )

    zz, yy, xx = _iotas(px0.shape, z0, y0)
    length = jnp.sqrt(dxv * dxv + dyv * dyv + dzv * dzv)
    can = (length > EPSILON) & (blockedf < 0.5)
    inv_len = 1.0 / jnp.maximum(length, EPSILON)
    dirx, diry, dirz = dxv * inv_len, dyv * inv_len, dzv * inv_len
    axis_slabs = firsthit_axis_slabs
    border_t = firsthit_border_t

    t_stop = jnp.minimum(
        jnp.minimum(border_t(px0, dirx, w), border_t(py0, diry, h)),
        border_t(pz0, dirz, d),
    )
    t_stop = jnp.minimum(t_stop, length)

    for oz in range(-D, D + 1):
        for oy in range(-D, D + 1):
            for ox in range(-D, D + 1):
                if ox == 0 and oy == 0 and oz == 0:
                    continue
                bl = _shift3(blockedf, oz, oy, ox) > 0.5
                valid = (
                    (xx + ox >= 0) & (xx + ox < w)
                    & (yy + oy >= 0) & (yy + oy < h)
                    & (zz + oz >= 0) & (zz + oz < d)
                )
                loX = (xx + ox).astype(F32) - HIT_MARGIN
                loY = (yy + oy).astype(F32) - HIT_MARGIN
                loZ = (zz + oz).astype(F32) - HIT_MARGIN
                ext = 1.0 + 2.0 * HIT_MARGIN
                tx_lo, tx_hi = axis_slabs(px0, dirx, loX, loX + ext)
                ty_lo, ty_hi = axis_slabs(py0, diry, loY, loY + ext)
                tz_lo, tz_hi = axis_slabs(pz0, dirz, loZ, loZ + ext)
                t_in = jnp.maximum(jnp.maximum(tx_lo, ty_lo), tz_lo)
                t_out = jnp.minimum(jnp.minimum(tx_hi, ty_hi), tz_hi)
                hit = bl & valid & (t_in <= t_out) & (t_in >= 0)
                t_stop = jnp.where(hit, jnp.minimum(t_stop, t_in), t_stop)

    t_stop = jnp.maximum(t_stop, 0.0)
    return (
        jnp.where(can, px0 + t_stop * dirx, px0),
        jnp.where(can, py0 + t_stop * diry, py0),
        jnp.where(can, pz0 + t_stop * dirz, pz0),
    )


def _advect_scalar3_kernel(
    src_hbm, u_hbm, v_hbm, w_hbm, flags_hbm,
    out_ref,
    src_s, u_s, v_s, w_s, fl_s, sems,
    *, D, dt, strength, block_z, block_y, halo, d, h, w,
    line_trace=False,
):
    bi = pl.program_id(0)
    zb = pl.program_id(1)
    yb = pl.program_id(2)
    z0 = zb * block_z - halo
    y0 = yb * block_y - halo
    ext_z = block_z + 2 * halo
    ext_y = block_y + 2 * halo

    copies = [
        pltpu.make_async_copy(
            ref.at[bi, pl.ds(zb * block_z, ext_z),
                   pl.ds(yb * block_y, ext_y)],
            s, sems.at[i],
        )
        for i, (ref, s) in enumerate(
            ((src_hbm, src_s), (u_hbm, u_s), (v_hbm, v_s),
             (w_hbm, w_s), (flags_hbm, fl_s))
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    src = src_s[:]
    fluidf = jnp.where(fl_s[:] == FLUID, 1.0, 0.0)
    fluid = fluidf > 0.5

    # centred velocity (ops3d.get_centered3) with global border zeroed
    cu = _border_zero3(0.5 * (u_s[:] + _shift3(u_s[:], 0, 0, 1)),
                       z0, y0, d, h, w)
    cv = _border_zero3(0.5 * (v_s[:] + _shift3(v_s[:], 0, 1, 0)),
                       z0, y0, d, h, w)
    cw = _border_zero3(0.5 * (w_s[:] + _shift3(w_s[:], 1, 0, 0)),
                       z0, y0, d, h, w)

    zz, yy, xx = _iotas(src.shape, z0, y0)
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    cz = zz.astype(F32) + 0.5

    def back_pos(sdt):
        if line_trace:
            # first-hit obstacle trace on the window-clipped displacement
            # (== ops3d.advect_scalar3 line_trace_impl='firsthit')
            dxv = jnp.clip(-sdt * cu, -D, D)
            dyv = jnp.clip(-sdt * cv, -D, D)
            dzv = jnp.clip(-sdt * cw, -D, D)
            return _line_trace_tile3(
                cx, cy, cz, dxv, dyv, dzv, 1.0 - fluidf, D, z0, y0, d, h, w
            )
        return cx - sdt * cu, cy - sdt * cv, cz - sdt * cw

    def sl(field, pos):
        val = _interpol_window3_tile(
            field, pos[0], pos[1], pos[2], D, z0, y0, d, h, w,
        )
        return jnp.where(fluid, val, field)

    fwd_pos = back_pos(dt)
    fwd = _border_zero3(sl(src, fwd_pos), z0, y0, d, h, w)
    bwd = _border_zero3(sl(fwd, back_pos(-dt)), z0, y0, d, h, w)
    dst = jnp.where(fluid, fwd + strength * 0.5 * (src - bwd), fwd)

    # clamp around the fwd landing cell (fluid cells; others keep start)
    px = jnp.where(fluid, fwd_pos[0], cx)
    py = jnp.where(fluid, fwd_pos[1], cy)
    pz = jnp.where(fluid, fwd_pos[2], cz)
    ok, minv, maxv = _clamp_bounds3_tile(
        src, fluidf, px, py, pz, D, z0, y0, d, h, w
    )
    clamped = jnp.where(ok, jnp.maximum(minv, jnp.minimum(maxv, dst)), fwd)

    interior = (
        (zz >= 1) & (zz <= d - 2)
        & (yy >= 1) & (yy <= h - 2)
        & (xx >= 1) & (xx <= w - 2)
    )
    out = jnp.where(interior, clamped, dst)

    out_ref[0] = out[halo:halo + block_z, halo:halo + block_y]


def advect_scalar3_pallas(
    dt, src, U, flags, maccormack_strength: float = 0.75,
    max_disp: int = 2, block_z: int = 8, block_y: int = 32,
    interpret: bool = False, line_trace: bool = False,
):
    """== ops3d.advect_scalar3(impl='window') for per-axis displacements
    <= max_disp (line_trace=True runs the fused first-hit obstacle trace,
    == line_trace_impl='firsthit'). src (b,d,h,w) f32, U (b,3,d,h,w),
    flags (b,d,h,w) int32. Tiles over (z, y); VMEM per program ~= 5 fields
    x (block_z+2*halo)(block_y+2*halo)*w floats plus unrolled-window
    temporaries."""
    b, d, h, w = src.shape
    assert d % block_z == 0, (d, block_z)
    assert h % block_y == 0, (h, block_y)
    halo = -(-(2 * (max_disp + 1)) // 8) * 8  # 8-aligned for Mosaic DMA
    ext_z = block_z + 2 * halo
    ext_y = block_y + 2 * halo

    pad = ((0, 0), (halo, halo), (halo, halo), (0, 0))
    args = (
        jnp.pad(src, pad),
        jnp.pad(U[:, 0], pad),
        jnp.pad(U[:, 1], pad),
        jnp.pad(U[:, 2], pad),
        jnp.pad(flags, pad),
    )

    kernel = partial(
        _advect_scalar3_kernel,
        D=max_disp, dt=float(dt), strength=float(maccormack_strength),
        block_z=block_z, block_y=block_y, halo=halo, d=d, h=h, w=w,
        line_trace=bool(line_trace),
    )
    grid_spec = pl.GridSpec(
        grid=(b, d // block_z, h // block_y),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=pl.BlockSpec(
            (1, block_z, block_y, w), lambda bi, zb, yb: (bi, zb, yb, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), I32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d, h, w), F32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)


def _advect_all3_kernel(
    src_hbm, u_hbm, v_hbm, w_hbm, flags_hbm,
    out_rho_ref, out_u_ref, out_v_ref, out_w_ref,
    src_s, u_s, v_s, w_s, fl_s, sems,
    *, D, dt, strength, block_z, block_y, halo, d, h, w, line_trace,
):
    """Scalar + 3-component MAC velocity MacCormack advection in ONE
    kernel: the u/v/w/flags tiles are DMA'd once instead of twice (the
    merged 2-D kernel's rationale, _advect_all_kernel). Semantics equal
    (_advect_scalar3_kernel, _advect_vel3_kernel); parity-tested."""
    bi = pl.program_id(0)
    zb = pl.program_id(1)
    yb = pl.program_id(2)
    z0 = zb * block_z - halo
    y0 = yb * block_y - halo
    ext_z = block_z + 2 * halo
    ext_y = block_y + 2 * halo

    copies = [
        pltpu.make_async_copy(
            ref.at[bi, pl.ds(zb * block_z, ext_z),
                   pl.ds(yb * block_y, ext_y)],
            s, sems.at[i],
        )
        for i, (ref, s) in enumerate(
            ((src_hbm, src_s), (u_hbm, u_s), (v_hbm, v_s),
             (w_hbm, w_s), (flags_hbm, fl_s))
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    src = src_s[:]
    u = u_s[:]
    v = v_s[:]
    wz_ = w_s[:]
    fluidf = jnp.where(fl_s[:] == FLUID, 1.0, 0.0)
    fluid = fluidf > 0.5

    zz, yy, xx = _iotas(src.shape, z0, y0)
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    cz = zz.astype(F32) + 0.5

    def bz3(a):
        return _border_zero3(a, z0, y0, d, h, w)

    # ---- scalar pipeline (== _advect_scalar3_kernel) ----
    cu = bz3(0.5 * (u + _shift3(u, 0, 0, 1)))
    cv = bz3(0.5 * (v + _shift3(v, 0, 1, 0)))
    cw = bz3(0.5 * (wz_ + _shift3(wz_, 1, 0, 0)))

    def back_pos(sdt):
        if line_trace:
            dxv = jnp.clip(-sdt * cu, -D, D)
            dyv = jnp.clip(-sdt * cv, -D, D)
            dzv = jnp.clip(-sdt * cw, -D, D)
            return _line_trace_tile3(
                cx, cy, cz, dxv, dyv, dzv, 1.0 - fluidf, D, z0, y0, d, h, w
            )
        return cx - sdt * cu, cy - sdt * cv, cz - sdt * cw

    def sl(field, pos):
        val = _interpol_window3_tile(
            field, pos[0], pos[1], pos[2], D, z0, y0, d, h, w,
        )
        return jnp.where(fluid, val, field)

    fwd_pos = back_pos(dt)
    s_fwd = bz3(sl(src, fwd_pos))
    s_bwd = bz3(sl(s_fwd, back_pos(-dt)))
    s_dst = jnp.where(fluid, s_fwd + strength * 0.5 * (src - s_bwd), s_fwd)
    px = jnp.where(fluid, fwd_pos[0], cx)
    py = jnp.where(fluid, fwd_pos[1], cy)
    pz = jnp.where(fluid, fwd_pos[2], cz)
    ok, minv, maxv = _clamp_bounds3_tile(
        src, fluidf, px, py, pz, D, z0, y0, d, h, w
    )
    s_cl = jnp.where(ok, jnp.maximum(minv, jnp.minimum(maxv, s_dst)), s_fwd)
    interior = (
        (zz >= 1) & (zz <= d - 2)
        & (yy >= 1) & (yy <= h - 2)
        & (xx >= 1) & (xx <= w - 2)
    )
    s_out = jnp.where(interior, s_cl, s_dst)

    # ---- velocity pipeline (== _advect_vel3_kernel) ----
    mac = [
        (
            bz3(u),
            bz3(0.25 * (v + _shift3(v, 0, 0, -1) + _shift3(v, 0, 1, 0)
                        + _shift3(v, 0, 1, -1))),
            bz3(0.25 * (wz_ + _shift3(wz_, 0, 0, -1) + _shift3(wz_, 1, 0, 0)
                        + _shift3(wz_, 1, 0, -1))),
        ),
        (
            bz3(0.25 * (u + _shift3(u, 0, -1, 0) + _shift3(u, 0, 0, 1)
                        + _shift3(u, 0, -1, 1))),
            bz3(v),
            bz3(0.25 * (wz_ + _shift3(wz_, 0, -1, 0) + _shift3(wz_, 1, 0, 0)
                        + _shift3(wz_, 1, -1, 0))),
        ),
        (
            bz3(0.25 * (u + _shift3(u, -1, 0, 0) + _shift3(u, 0, 0, 1)
                        + _shift3(u, -1, 0, 1))),
            bz3(0.25 * (v + _shift3(v, -1, 0, 0) + _shift3(v, 0, 1, 0)
                        + _shift3(v, -1, 1, 0))),
            bz3(wz_),
        ),
    ]

    comps = (u, v, wz_)
    axes = ((0, 0, 1), (0, 1, 0), (1, 0, 0))
    outs = []
    for c in range(3):
        mu, mv, mw = mac[c]

        def sample(field, sdt):
            val = _interpol_window3_tile(
                field, cx - sdt * mu, cy - sdt * mv, cz - sdt * mw,
                D, z0, y0, d, h, w,
            )
            return jnp.where(fluid, val, field)

        fwd = bz3(sample(comps[c], dt))
        bwd = bz3(sample(fwd, -dt))

        ndz, ndy, ndx = axes[c]
        fm = _shift3(fluidf, -ndz, -ndy, -ndx) > 0.5
        idx = (xx, yy, zz)[c]
        skip = (~fluid) | ((idx > 0) & (~fm))
        dst = jnp.where(
            skip, fwd, fwd + strength * 0.5 * (comps[c] - bwd)
        )
        out = _clamp_mac3_tile(
            dst, comps[c], mu * dt, mv * dt, mw * dt, D, z0, y0, d, h, w
        )
        outs.append(bz3(out))

    out_rho_ref[0] = s_out[halo:halo + block_z, halo:halo + block_y]
    out_u_ref[0] = outs[0][halo:halo + block_z, halo:halo + block_y]
    out_v_ref[0] = outs[1][halo:halo + block_z, halo:halo + block_y]
    out_w_ref[0] = outs[2][halo:halo + block_z, halo:halo + block_y]


def advect_all3_pallas(
    dt, src, U, flags, maccormack_strength: float = 0.75,
    max_disp: int = 2, block_z: int = 8, block_y: int = 32,
    interpret: bool = False, line_trace: bool = False,
):
    """Scalar + MAC velocity 3-D advection fused in one pallas_call.

    == (advect_scalar3_pallas(...), advect_velocity3_pallas(...)) — both
    pipelines consume the same pre-advection U, exactly as the 3-D step
    does. Returns (rho', U')."""
    b, d, h, w = src.shape
    assert d % block_z == 0, (d, block_z)
    assert h % block_y == 0, (h, block_y)
    halo = -(-(2 * (max_disp + 1)) // 8) * 8
    ext_z = block_z + 2 * halo
    ext_y = block_y + 2 * halo

    pad = ((0, 0), (halo, halo), (halo, halo), (0, 0))
    args = (
        jnp.pad(src, pad),
        jnp.pad(U[:, 0], pad),
        jnp.pad(U[:, 1], pad),
        jnp.pad(U[:, 2], pad),
        jnp.pad(flags, pad),
    )

    kernel = partial(
        _advect_all3_kernel,
        D=max_disp, dt=float(dt), strength=float(maccormack_strength),
        block_z=block_z, block_y=block_y, halo=halo, d=d, h=h, w=w,
        line_trace=bool(line_trace),
    )
    out_spec = pl.BlockSpec(
        (1, block_z, block_y, w), lambda bi, zb, yb: (bi, zb, yb, 0)
    )
    grid_spec = pl.GridSpec(
        grid=(b, d // block_z, h // block_y),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=[out_spec, out_spec, out_spec, out_spec],
        scratch_shapes=[
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), I32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )
    rho, ou, ov, ow = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, d, h, w), F32)] * 4,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return rho, jnp.stack([ou, ov, ow], axis=1)


def _clamp_mac3_tile(dst, orig, vx, vy, vz, D, z0, y0, d, h, w):
    """3-D Selle corner clamp (matches window3.clamp_component_mac_window3):
    min/max of ``orig`` over the trilinear corners of the two integer
    positions idx -/+ v*dt."""
    zz, yy, xx = _iotas(orig.shape, z0, y0)
    vx = jnp.clip(vx, -D, D)
    vy = jnp.clip(vy, -D, D)
    vz = jnp.clip(vz, -D, D)

    def offsets(sign):
        cx = (xx.astype(F32) + sign * vx).astype(I32)
        cy = (yy.astype(F32) + sign * vy).astype(I32)
        cz = (zz.astype(F32) + sign * vz).astype(I32)
        return (
            jnp.clip(cx, 0, w - 2) - xx,
            jnp.clip(cy, 0, h - 2) - yy,
            jnp.clip(cz, 0, d - 2) - zz,
        )

    oM = offsets(-1.0)
    oP = offsets(1.0)

    minv = jnp.full_like(orig, jnp.inf)
    maxv = jnp.full_like(orig, -jnp.inf)
    for oz in range(-D, D + 2):
        mzM = (oM[2] == oz) | (oM[2] == oz - 1)
        mzP = (oP[2] == oz) | (oP[2] == oz - 1)
        for oy in range(-D, D + 2):
            myM = mzM & ((oM[1] == oy) | (oM[1] == oy - 1))
            myP = mzP & ((oP[1] == oy) | (oP[1] == oy - 1))
            for ox in range(-D, D + 2):
                m = (myM & ((oM[0] == ox) | (oM[0] == ox - 1))) | (
                    myP & ((oP[0] == ox) | (oP[0] == ox - 1))
                )
                s = _shift3(orig, oz, oy, ox)
                minv = jnp.where(m, jnp.minimum(minv, s), minv)
                maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
    return jnp.maximum(jnp.minimum(dst, maxv), minv)


def _advect_vel3_kernel(
    u_hbm, v_hbm, w_hbm, flags_hbm,
    out_u_ref, out_v_ref, out_w_ref,
    u_s, v_s, w_s, fl_s, sems,
    *, D, dt, strength, block_z, block_y, halo, d, h, w,
):
    bi = pl.program_id(0)
    zb = pl.program_id(1)
    yb = pl.program_id(2)
    z0 = zb * block_z - halo
    y0 = yb * block_y - halo
    ext_z = block_z + 2 * halo
    ext_y = block_y + 2 * halo

    copies = [
        pltpu.make_async_copy(
            ref.at[bi, pl.ds(zb * block_z, ext_z),
                   pl.ds(yb * block_y, ext_y)],
            s, sems.at[i],
        )
        for i, (ref, s) in enumerate(
            ((u_hbm, u_s), (v_hbm, v_s), (w_hbm, w_s), (flags_hbm, fl_s))
        )
    ]
    for c in copies:
        c.start()
    for c in copies:
        c.wait()

    u = u_s[:]
    v = v_s[:]
    wz_ = w_s[:]
    fluidf = jnp.where(fl_s[:] == FLUID, 1.0, 0.0)
    fluid = fluidf > 0.5

    zz, yy, xx = _iotas(u.shape, z0, y0)
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    cz = zz.astype(F32) + 0.5

    def bz3(a):
        return _border_zero3(a, z0, y0, d, h, w)

    # full velocity vector at each component's face (ops3d mac resampling)
    mac = [
        (
            bz3(u),
            bz3(0.25 * (v + _shift3(v, 0, 0, -1) + _shift3(v, 0, 1, 0)
                        + _shift3(v, 0, 1, -1))),
            bz3(0.25 * (wz_ + _shift3(wz_, 0, 0, -1) + _shift3(wz_, 1, 0, 0)
                        + _shift3(wz_, 1, 0, -1))),
        ),
        (
            bz3(0.25 * (u + _shift3(u, 0, -1, 0) + _shift3(u, 0, 0, 1)
                        + _shift3(u, 0, -1, 1))),
            bz3(v),
            bz3(0.25 * (wz_ + _shift3(wz_, 0, -1, 0) + _shift3(wz_, 1, 0, 0)
                        + _shift3(wz_, 1, -1, 0))),
        ),
        (
            bz3(0.25 * (u + _shift3(u, -1, 0, 0) + _shift3(u, 0, 0, 1)
                        + _shift3(u, -1, 0, 1))),
            bz3(0.25 * (v + _shift3(v, -1, 0, 0) + _shift3(v, 0, 1, 0)
                        + _shift3(v, -1, 1, 0))),
            bz3(wz_),
        ),
    ]

    comps = (u, v, wz_)
    axes = ((0, 0, 1), (0, 1, 0), (1, 0, 0))  # (dz, dy, dx) per comp
    outs = []
    for c in range(3):
        mu, mv, mw = mac[c]

        def sample(field, sdt):
            val = _interpol_window3_tile(
                field, cx - sdt * mu, cy - sdt * mv, cz - sdt * mw,
                D, z0, y0, d, h, w,
            )
            return jnp.where(fluid, val, field)

        fwd = bz3(sample(comps[c], dt))
        bwd = bz3(sample(fwd, -dt))

        ndz, ndy, ndx = axes[c]
        fm = _shift3(fluidf, -ndz, -ndy, -ndx) > 0.5
        # index along the normal axis: xx for u, yy for v, zz for w
        idx = (xx, yy, zz)[c]
        skip = (~fluid) | ((idx > 0) & (~fm))
        dst = jnp.where(
            skip, fwd, fwd + strength * 0.5 * (comps[c] - bwd)
        )
        out = _clamp_mac3_tile(
            dst, comps[c], mu * dt, mv * dt, mw * dt, D, z0, y0, d, h, w
        )
        outs.append(bz3(out))

    out_u_ref[0] = outs[0][halo:halo + block_z, halo:halo + block_y]
    out_v_ref[0] = outs[1][halo:halo + block_z, halo:halo + block_y]
    out_w_ref[0] = outs[2][halo:halo + block_z, halo:halo + block_y]


def advect_velocity3_pallas(
    dt, U, flags, maccormack_strength: float = 0.75,
    max_disp: int = 2, block_z: int = 8, block_y: int = 32,
    interpret: bool = False,
):
    """== ops3d.advect_velocity3(impl='window') for per-axis displacements
    <= max_disp. U (b,3,d,h,w) f32, flags (b,d,h,w) int32."""
    b, _, d, h, w = U.shape
    assert d % block_z == 0, (d, block_z)
    assert h % block_y == 0, (h, block_y)
    halo = -(-(2 * (max_disp + 1)) // 8) * 8
    ext_z = block_z + 2 * halo
    ext_y = block_y + 2 * halo

    pad = ((0, 0), (halo, halo), (halo, halo), (0, 0))
    args = (
        jnp.pad(U[:, 0], pad),
        jnp.pad(U[:, 1], pad),
        jnp.pad(U[:, 2], pad),
        jnp.pad(flags, pad),
    )

    kernel = partial(
        _advect_vel3_kernel,
        D=max_disp, dt=float(dt), strength=float(maccormack_strength),
        block_z=block_z, block_y=block_y, halo=halo, d=d, h=h, w=w,
    )
    out_spec = pl.BlockSpec(
        (1, block_z, block_y, w), lambda bi, zb, yb: (bi, zb, yb, 0)
    )
    grid_spec = pl.GridSpec(
        grid=(b, d // block_z, h // block_y),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[out_spec, out_spec, out_spec],
        scratch_shapes=[
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), F32),
            pltpu.VMEM((ext_z, ext_y, w), I32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    ou, ov, ow = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, d, h, w), F32)] * 3,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return jnp.stack([ou, ov, ow], axis=1)
