"""Fused MAC velocity advection (Pallas TPU kernel, window semantics).

One kernel does the whole MacCormack velocity pipeline — face-velocity
resampling, forward & backward semi-Lagrangian window sampling, correction
with fluid-skip masks, Selle clamp — entirely in VMEM, so the (2D+2)^2
window passes cost VPU cycles instead of HBM round-trips. Semantics equal
ops.advection.advect_velocity(impl='window') and are tested against it.

Tiling: grid over (batch, row-blocks); each program DMAs its row block plus
a halo of H_HALO rows from HBM into VMEM scratch (window shifts never reach
further than max_disp+2 rows), computes, and writes the interior block.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...celltype import FLUID
from .jacobi_pallas import _shift

F32 = jnp.float32
I32 = jnp.int32


def _border_zero(a, row0, col0, h, w, bnd=1):
    """Zero the global 1-ring border inside an extended tile whose first
    row/col is global (row0, col0) (traced)."""
    th, tw = a.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0
    keep = (xx >= bnd) & (xx <= w - 1 - bnd) & (yy >= bnd) & (yy <= h - 1 - bnd)
    return jnp.where(keep, a, 0.0)


def _interpol_window_tile(src, pos_x, pos_y, D, row0, col0, h, w):
    """Bilinear window sample on an extended tile. ``src`` and positions are
    (th, tw); positions are ABSOLUTE grid coordinates; the tile's first
    row/col is global (row0, col0). Matches ops.window.interpol_window."""
    th, tw = src.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0

    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    px = jnp.clip(pos_x, cx - D, cx + D) - 0.5
    py = jnp.clip(pos_y, cy - D, cy + D) - 0.5
    x0 = jnp.trunc(px).astype(I32)
    y0 = jnp.trunc(py).astype(I32)
    s1 = jnp.clip(px - x0.astype(F32), 0.0, 1.0)
    t1 = jnp.clip(py - y0.astype(F32), 0.0, 1.0)
    x0 = jnp.clip(x0, 0, w - 2)
    y0 = jnp.clip(y0, 0, h - 2)
    ox0 = x0 - xx
    oy0 = y0 - yy
    s0, t0 = 1.0 - s1, 1.0 - t1

    out = jnp.zeros_like(src)
    for oy in range(-D, D + 2):
        wy = t0 * (oy0 == oy) + t1 * (oy0 == oy - 1)
        row = jnp.zeros_like(src)
        for ox in range(-D, D + 2):
            wx = s0 * (ox0 == ox) + s1 * (ox0 == ox - 1)
            row = row + wx * _shift(src, oy, ox)
        out = out + wy * row
    return out


def _clamp_mac_tile(dst, orig, velx_dt, vely_dt, D, row0, col0, h, w):
    """Selle clamp on an extended tile (matches
    ops.window.clamp_component_mac_window)."""
    th, tw = orig.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0
    vx = jnp.clip(velx_dt, -D, D)
    vy = jnp.clip(vely_dt, -D, D)

    def offsets(sign):
        cx = (xx.astype(F32) + sign * vx).astype(I32)
        cy = (yy.astype(F32) + sign * vy).astype(I32)
        return jnp.clip(cx, 0, w - 2) - xx, jnp.clip(cy, 0, h - 2) - yy

    oiM, ojM = offsets(-1.0)
    oiP, ojP = offsets(1.0)

    minv = jnp.full_like(orig, jnp.inf)
    maxv = jnp.full_like(orig, -jnp.inf)
    for oy in range(-D, D + 2):
        myM = (ojM == oy) | (ojM == oy - 1)
        myP = (ojP == oy) | (ojP == oy - 1)
        for ox in range(-D, D + 2):
            m = (myM & ((oiM == ox) | (oiM == ox - 1))) | (
                myP & ((oiP == ox) | (oiP == ox - 1))
            )
            s = _shift(orig, oy, ox)
            minv = jnp.where(m, jnp.minimum(minv, s), minv)
            maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
    return jnp.maximum(jnp.minimum(dst, maxv), minv)


def _advect_vel_kernel(
    # inputs (HBM, padded by ``halo`` rows top+bottom); with has_orig the
    # separate advected field (the viscous field, ref simulate.py:66-93)
    # follows flags as (ou_hbm, ov_hbm)
    *refs,
    D, dt, strength, block, halo, cw, halo_c, h, w, has_orig,
):
    if has_orig:
        (u_hbm, v_hbm, flags_hbm, ou_hbm, ov_hbm,
         out_u_ref, out_v_ref,
         u_s, v_s, fl_s, ou_s, ov_s, sems) = refs
        ins = [(u_hbm, u_s), (v_hbm, v_s), (flags_hbm, fl_s),
               (ou_hbm, ou_s), (ov_hbm, ov_s)]
    else:
        (u_hbm, v_hbm, flags_hbm,
         out_u_ref, out_v_ref,
         u_s, v_s, fl_s, sems) = refs
        ins = [(u_hbm, u_s), (v_hbm, v_s), (flags_hbm, fl_s)]
    bi = pl.program_id(0)
    rb = pl.program_id(1)
    cb = pl.program_id(2)
    # In padded coordinates the extended tile starts at (rb*block, cb*cw);
    # its first row/col corresponds to global (rb*block - halo,
    # cb*cw - halo_c).
    row0 = rb * block - halo
    col0 = cb * cw - halo_c
    ext = block + 2 * halo
    ext_c = cw + 2 * halo_c

    cps = [
        pltpu.make_async_copy(
            r.at[bi, pl.ds(rb * block, ext), pl.ds(cb * cw, ext_c)], s,
            sems.at[k])
        for k, (r, s) in enumerate(ins)
    ]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()

    u = u_s[:]
    v = v_s[:]
    ou, ov = (ou_s[:], ov_s[:]) if has_orig else (u, v)
    fluidf = jnp.where(fl_s[:] == FLUID, 1.0, 0.0)  # f32 mask: Mosaic
    fluid = fluidf > 0.5                            # dislikes i1 shifts

    # Face-centred full velocity vectors (grid.get_at_mac_x/y) with the
    # global 1-ring border zeroed.
    mac_x_u = _border_zero(u, row0, col0, h, w)
    mac_x_v = _border_zero(
        0.25 * (v + _shift(v, 0, -1) + _shift(v, 1, 0) + _shift(v, 1, -1)),
        row0, col0, h, w,
    )
    mac_y_u = _border_zero(
        0.25 * (u + _shift(u, -1, 0) + _shift(u, 0, 1) + _shift(u, -1, 1)),
        row0, col0, h, w,
    )
    mac_y_v = _border_zero(v, row0, col0, h, w)

    th, tw = u.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5

    def semi_lagrange(fu, fv, sdt):
        su = _interpol_window_tile(
            fu, cx - sdt * mac_x_u, cy - sdt * mac_x_v, D, row0, col0, h, w
        )
        sv = _interpol_window_tile(
            fv, cx - sdt * mac_y_u, cy - sdt * mac_y_v, D, row0, col0, h, w
        )
        return (
            jnp.where(fluid, su, fu),
            jnp.where(fluid, sv, fv),
        )

    fwd_u, fwd_v = semi_lagrange(ou, ov, dt)
    fwd_u = _border_zero(fwd_u, row0, col0, h, w)
    fwd_v = _border_zero(fwd_v, row0, col0, h, w)

    bwd_u, bwd_v = semi_lagrange(fwd_u, fwd_v, -dt)
    bwd_u = _border_zero(bwd_u, row0, col0, h, w)
    bwd_v = _border_zero(bwd_v, row0, col0, h, w)

    fl_xm = _shift(fluidf, 0, -1) > 0.5
    fl_ym = _shift(fluidf, -1, 0) > 0.5
    skip_u = (~fluid) | ((xx > 0) & (~fl_xm))
    skip_v = (~fluid) | ((yy > 0) & (~fl_ym))
    dst_u = jnp.where(skip_u, fwd_u, fwd_u + strength * 0.5 * (ou - bwd_u))
    dst_v = jnp.where(skip_v, fwd_v, fwd_v + strength * 0.5 * (ov - bwd_v))

    out_u = _clamp_mac_tile(dst_u, ou, mac_x_u * dt, mac_x_v * dt, D,
                            row0, col0, h, w)
    out_v = _clamp_mac_tile(dst_v, ov, mac_y_u * dt, mac_y_v * dt, D,
                            row0, col0, h, w)
    out_u = _border_zero(out_u, row0, col0, h, w)
    out_v = _border_zero(out_v, row0, col0, h, w)

    # This program owns global rows [rb*block, +block) x cols [cb*cw, +cw),
    # at static offsets (halo, halo_c) inside the extended tile.
    out_u_ref[0] = out_u[halo:halo + block, halo_c:halo_c + cw]
    out_v_ref[0] = out_v[halo:halo + block, halo_c:halo_c + cw]


def advect_velocity_pallas(
    dt, U, flags, maccormack_strength: float = 0.75,
    max_disp: int = 4, block: int = 64, interpret: bool = False,
    orig=None,
):
    """Advection of MAC velocity ``orig`` by ``U`` (== ops.advection.
    advect_velocity(impl='window'); orig=None self-advects U — the extra
    field DMAs are skipped then). flags (b,h,w) int32, U (b,2,h,w) f32."""
    b, _, h, w = U.shape
    assert h % block == 0, (h, block)
    halo = -(-(2 * (max_disp + 1)) // 8) * 8  # 8-row aligned for Mosaic DMA
    ext = block + 2 * halo
    n_rb = h // block
    has_orig = orig is not None

    # Lane (w) handling: Mosaic requires lane-aligned VMEM slices, so pad
    # to the 128 tile. Wide grids additionally tile the lane dim (the
    # unrolled window ops otherwise blow the vector-register budget —
    # measured 183M of spill slots at 8064 lanes): column blocks of
    # ``cw`` lanes with a 128-lane halo (aligned, >> max_disp+2).
    cw, halo_c = _pick_cols(w)
    wp = -(-w // cw) * cw
    ext_c = cw + 2 * halo_c
    n_cb = wp // cw
    pad = ((0, 0), (halo, halo), (halo_c, wp - w + halo_c))
    args = [jnp.pad(U[:, 0], pad), jnp.pad(U[:, 1], pad),
            jnp.pad(flags, pad)]
    scratch = [
        pltpu.VMEM((ext, ext_c), F32),
        pltpu.VMEM((ext, ext_c), F32),
        pltpu.VMEM((ext, ext_c), I32),
    ]
    if has_orig:
        args += [jnp.pad(orig[:, 0], pad), jnp.pad(orig[:, 1], pad)]
        scratch += [pltpu.VMEM((ext, ext_c), F32),
                    pltpu.VMEM((ext, ext_c), F32)]

    kernel = partial(
        _advect_vel_kernel,
        D=max_disp, dt=float(dt), strength=float(maccormack_strength),
        block=block, halo=halo, cw=cw, halo_c=halo_c, h=h, w=w,
        has_orig=has_orig,
    )
    grid_spec = pl.GridSpec(
        grid=(b, n_rb, n_cb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(args),
        out_specs=[
            pl.BlockSpec((1, block, cw), lambda bi, rb, cb: (bi, rb, cb)),
            pl.BlockSpec((1, block, cw), lambda bi, rb, cb: (bi, rb, cb)),
        ],
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((len(args),))],
    )
    out_u, out_v = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp), F32),
            jax.ShapeDtypeStruct((b, h, wp), F32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return jnp.stack([out_u, out_v], axis=1)[..., :w]


def _interpol_fluid_window_tile(src, fl, pos_x, pos_y, D, row0, col0, h, w):
    """Fluid-aware bilinear window sample on an extended tile (matches
    ops.window.interpol_with_fluid_window). ``fl`` is the fluid mask as f32."""
    th, tw = src.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    px = jnp.clip(pos_x, cx - D, cx + D) - 0.5
    py = jnp.clip(pos_y, cy - D, cy + D) - 0.5
    x0 = jnp.trunc(px).astype(I32)
    y0 = jnp.trunc(py).astype(I32)
    s1 = jnp.clip(px - x0.astype(F32), 0.0, 1.0)
    t1 = jnp.clip(py - y0.astype(F32), 0.0, 1.0)
    x0 = jnp.clip(x0, 0, w - 2)
    y0 = jnp.clip(y0, 0, h - 2)
    ox0 = x0 - xx
    oy0 = y0 - yy
    s0, t0 = 1.0 - s1, 1.0 - t1

    zero = jnp.zeros_like(src)
    Va = Vb = Vc = Vd = zero
    Fa = Fb = Fc = Fd = zero
    for oy in range(-D, D + 2):
        my0 = oy0 == oy
        my1 = oy0 == oy - 1
        rV0 = rV1 = rF0 = rF1 = zero
        for ox in range(-D, D + 2):
            s = _shift(src, oy, ox)
            f = _shift(fl, oy, ox)
            mx0 = ox0 == ox
            mx1 = ox0 == ox - 1
            rV0 = rV0 + jnp.where(mx0, s, 0.0)
            rV1 = rV1 + jnp.where(mx1, s, 0.0)
            rF0 = rF0 + jnp.where(mx0, f, 0.0)
            rF1 = rF1 + jnp.where(mx1, f, 0.0)
        Va = Va + jnp.where(my0, rV0, 0.0)
        Vb = Vb + jnp.where(my1, rV0, 0.0)
        Vc = Vc + jnp.where(my0, rV1, 0.0)
        Vd = Vd + jnp.where(my1, rV1, 0.0)
        Fa = Fa + jnp.where(my0, rF0, 0.0)
        Fb = Fb + jnp.where(my1, rF0, 0.0)
        Fc = Fc + jnp.where(my0, rF1, 0.0)
        Fd = Fd + jnp.where(my1, rF1, 0.0)
    Fa, Fb, Fc, Fd = Fa > 0.5, Fb > 0.5, Fc > 0.5, Fd > 0.5

    def comb(va, ba, vb, bb, ta, tb):
        m0 = (~ba) & (~bb)
        m1 = (~ba) & bb
        m2 = ba & (~bb)
        val = jnp.where(
            m0, 0.0, jnp.where(m1, vb, jnp.where(m2, va, va * ta + vb * tb))
        )
        return val, ~m0

    Iab, fab = comb(Va, Fa, Vb, Fb, t0, t1)
    Icd, fcd = comb(Vc, Fc, Vd, Fd, t0, t1)
    Ival, fval = comb(Iab, fab, Icd, fcd, s0, s1)
    plain = (Va * t0 + Vb * t1) * s0 + (Vc * t0 + Vd * t1) * s1
    return jnp.where(fval, Ival, plain)


def _clamp_scalar_tile(dst, src, fwd, fl_ok, pos_x, pos_y, D, row0, col0,
                       h, w):
    """3x3 fluid-neighbourhood clamp on an extended tile (matches
    ops.window.clamp_bounds_scalar_window semantics)."""
    th, tw = src.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    px = jnp.clip(pos_x, cx - D, cx + D)
    py = jnp.clip(pos_y, cy - D, cy + D)
    i0 = jnp.clip(jnp.trunc(px).astype(I32), 0, w - 1)
    j0 = jnp.clip(jnp.trunc(py).astype(I32), 0, h - 1)
    oi0 = i0 - xx
    oj0 = j0 - yy

    minv = jnp.full_like(src, jnp.inf)
    maxv = jnp.full_like(src, -jnp.inf)
    cnt = jnp.zeros_like(src)
    for oy in range(-D - 1, D + 2):
        my = jnp.abs(oj0 - oy) <= 1
        rok = (yy + oy >= 0) & (yy + oy < h)
        for ox in range(-D - 1, D + 2):
            m = (
                my & (jnp.abs(oi0 - ox) <= 1) & rok
                & (xx + ox >= 0) & (xx + ox < w)
                & (_shift(fl_ok, oy, ox) > 0.5)
            )
            s = _shift(src, oy, ox)
            minv = jnp.where(m, jnp.minimum(minv, s), minv)
            maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
            cnt = cnt + m.astype(F32)
    return jnp.where(
        cnt >= 1.0, jnp.maximum(minv, jnp.minimum(maxv, dst)), fwd
    )


def _line_trace_tile(px0, py0, dxv, dyv, blockedf, D, row0, col0, h, w):
    """Continuous first-hit obstacle trace on an extended tile — the same
    maths as line_trace.line_trace_firsthit (see its docstring for the
    march-vs-first-hit semantics), with window lookups as static shifts.
    ``blockedf`` is the non-fluid mask as f32; positions/deltas are (th, tw)
    absolute coordinates. Returns the traced (x, y)."""
    from ..line_trace import (
        EPSILON,
        HIT_MARGIN,
        firsthit_axis_slabs,
        firsthit_border_t,
    )

    th, tw = px0.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0

    length = jnp.sqrt(dxv * dxv + dyv * dyv)
    can = (length > EPSILON) & (blockedf < 0.5)
    inv_len = 1.0 / jnp.maximum(length, EPSILON)
    dirx, diry = dxv * inv_len, dyv * inv_len
    axis_slabs = firsthit_axis_slabs
    border_t = firsthit_border_t

    t_stop = jnp.minimum(border_t(px0, dirx, w), border_t(py0, diry, h))
    t_stop = jnp.minimum(t_stop, length)

    for oy in range(-D, D + 1):
        for ox in range(-D, D + 1):
            if ox == 0 and oy == 0:
                continue
            bl = _shift(blockedf, oy, ox) > 0.5
            valid = (
                (xx + ox >= 0) & (xx + ox < w)
                & (yy + oy >= 0) & (yy + oy < h)
            )
            loX = (xx + ox).astype(F32) - HIT_MARGIN
            loY = (yy + oy).astype(F32) - HIT_MARGIN
            tx_lo, tx_hi = axis_slabs(px0, dirx, loX,
                                      loX + 1.0 + 2.0 * HIT_MARGIN)
            ty_lo, ty_hi = axis_slabs(py0, diry, loY,
                                      loY + 1.0 + 2.0 * HIT_MARGIN)
            t_in = jnp.maximum(tx_lo, ty_lo)
            t_out = jnp.minimum(tx_hi, ty_hi)
            hit = bl & valid & (t_in <= t_out) & (t_in >= 0)
            t_stop = jnp.where(hit, jnp.minimum(t_stop, t_in), t_stop)

    t_stop = jnp.maximum(t_stop, 0.0)
    return (
        jnp.where(can, px0 + t_stop * dirx, px0),
        jnp.where(can, py0 + t_stop * diry, py0),
    )


def _advect_scalar_kernel(
    src_hbm, u_hbm, v_hbm, flags_hbm,
    out_ref,
    src_s, u_s, v_s, fl_s, sems,
    *, D, dt, strength, sample_outside, block, halo, cw, halo_c, h, w,
    line_trace=False,
):
    bi = pl.program_id(0)
    rb = pl.program_id(1)
    cb = pl.program_id(2)
    row0 = rb * block - halo    # global row/col of the ext. tile's origin
    col0 = cb * cw - halo_c
    ext = block + 2 * halo
    ext_c = cw + 2 * halo_c

    cps = [
        pltpu.make_async_copy(
            r.at[bi, pl.ds(rb * block, ext), pl.ds(cb * cw, ext_c)], s,
            sems.at[k]
        )
        for k, (r, s) in enumerate(
            [(src_hbm, src_s), (u_hbm, u_s), (v_hbm, v_s), (flags_hbm, fl_s)]
        )
    ]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()

    src = src_s[:]
    u = u_s[:]
    v = v_s[:]
    flf = jnp.where(fl_s[:] == FLUID, 1.0, 0.0)
    fluid = flf > 0.5
    fl_ok = flf if not sample_outside else jnp.ones_like(flf)

    # centred velocity, zeroed on the global 1-ring border
    ccx = _border_zero(0.5 * (u + _shift(u, 0, 1)), row0, col0, h, w)
    ccy = _border_zero(0.5 * (v + _shift(v, 1, 0)), row0, col0, h, w)

    th, tw = src.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5

    def semi_lagrange(field, sdt):
        if line_trace:
            # reference scalar-advection semantics: the back-trace never
            # crosses obstacles (ref: fluids_init.cpp:300); the XLA window
            # path clips the displacement to the window before tracing.
            dxv = jnp.clip(-sdt * ccx, -D, D)
            dyv = jnp.clip(-sdt * ccy, -D, D)
            bx, by = _line_trace_tile(
                cx, cy, dxv, dyv, 1.0 - flf, D, row0, col0, h, w
            )
        else:
            bx = cx - sdt * ccx
            by = cy - sdt * ccy
        if sample_outside:
            val = _interpol_window_tile(field, bx, by, D, row0, col0, h, w)
        else:
            val = _interpol_fluid_window_tile(
                field, flf, bx, by, D, row0, col0, h, w
            )
        return jnp.where(fluid, val, field), bx, by

    fwd, fx, fy = semi_lagrange(src, dt)
    fwd = _border_zero(fwd, row0, col0, h, w)
    fwd_px = jnp.where(fluid, fx, cx)
    fwd_py = jnp.where(fluid, fy, cy)

    bwd, _, _ = semi_lagrange(fwd, -dt)
    bwd = _border_zero(bwd, row0, col0, h, w)

    dst = jnp.where(fluid, fwd + strength * 0.5 * (src - bwd), fwd)
    out = _clamp_scalar_tile(
        dst, src, fwd, fl_ok, fwd_px, fwd_py, D, row0, col0, h, w
    )
    # the global border keeps the corrected (uncclamped) value, like the
    # XLA path
    bmask = (
        (xx < 1) | (xx > w - 2) | (yy < 1) | (yy > h - 2)
    )
    out = jnp.where(bmask, dst, out)

    out_ref[0] = out[halo:halo + block, halo_c:halo_c + cw]


def advect_scalar_pallas(
    dt, src, U, flags, maccormack_strength: float = 0.75,
    sample_outside_fluid: bool = False, max_disp: int = 4,
    block: int = 64, interpret: bool = False, line_trace: bool = False,
):
    """Fused MacCormack scalar advection. With ``line_trace=True`` the
    back-traces run the continuous first-hit obstacle trace
    (== ops.advection.advect_scalar(impl='window', line_trace=True,
    line_trace_impl='firsthit'), the reference's scalar-advection
    semantics, ref: fluids_init.cpp:300); with False the straight
    back-trace variant (== line_trace=False)."""
    b, h, w = src.shape
    assert h % block == 0, (h, block)
    halo = -(-(2 * (max_disp + 1)) // 8) * 8  # 8-row aligned for Mosaic DMA
    ext = block + 2 * halo
    n_rb = h // block

    # Lane padding + wide-grid column tiling (see advect_velocity_pallas).
    cw, halo_c = _pick_cols(w)
    wp = -(-w // cw) * cw
    ext_c = cw + 2 * halo_c
    n_cb = wp // cw
    pad = ((0, 0), (halo, halo), (halo_c, wp - w + halo_c))
    src_p = jnp.pad(src, pad)
    u_p = jnp.pad(U[:, 0], pad)
    v_p = jnp.pad(U[:, 1], pad)
    fl_p = jnp.pad(flags, pad)

    kernel = partial(
        _advect_scalar_kernel,
        D=max_disp, dt=float(dt), strength=float(maccormack_strength),
        sample_outside=bool(sample_outside_fluid),
        block=block, halo=halo, cw=cw, halo_c=halo_c, h=h, w=w,
        line_trace=bool(line_trace),
    )
    grid_spec = pl.GridSpec(
        grid=(b, n_rb, n_cb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=pl.BlockSpec((1, block, cw),
                               lambda bi, rb, cb: (bi, rb, cb)),
        scratch_shapes=[
            pltpu.VMEM((ext, ext_c), F32),
            pltpu.VMEM((ext, ext_c), F32),
            pltpu.VMEM((ext, ext_c), F32),
            pltpu.VMEM((ext, ext_c), I32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, wp), F32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(src_p, u_p, v_p, fl_p)[..., :w]


def _advect_all_kernel(
    # src, u, v, flags [, ou, ov] in HBM; outputs rho', u', v'
    *refs,
    D, dt, strength, sample_outside, block, halo, cw, halo_c, h, w,
    line_trace, has_orig,
):
    """Scalar + MAC-velocity MacCormack advection in ONE kernel.

    The two standalone kernels (_advect_scalar_kernel, _advect_vel_kernel)
    each DMA u, v and flags; running both pipelines on one extended tile
    halves those loads and saves a dispatch — advection is the largest
    slice of the 512^2 step (docs/results/step_breakdown_512_r3.txt).
    Semantics are exactly the standalone kernels' (parity-tested)."""
    if has_orig:
        (src_hbm, u_hbm, v_hbm, flags_hbm, ou_hbm, ov_hbm,
         out_rho_ref, out_u_ref, out_v_ref,
         src_s, u_s, v_s, fl_s, ou_s, ov_s, sems) = refs
        ins = [(src_hbm, src_s), (u_hbm, u_s), (v_hbm, v_s),
               (flags_hbm, fl_s), (ou_hbm, ou_s), (ov_hbm, ov_s)]
    else:
        (src_hbm, u_hbm, v_hbm, flags_hbm,
         out_rho_ref, out_u_ref, out_v_ref,
         src_s, u_s, v_s, fl_s, sems) = refs
        ins = [(src_hbm, src_s), (u_hbm, u_s), (v_hbm, v_s),
               (flags_hbm, fl_s)]
    bi = pl.program_id(0)
    rb = pl.program_id(1)
    cb = pl.program_id(2)
    row0 = rb * block - halo
    col0 = cb * cw - halo_c
    ext = block + 2 * halo
    ext_c = cw + 2 * halo_c

    cps = [
        pltpu.make_async_copy(
            r.at[bi, pl.ds(rb * block, ext), pl.ds(cb * cw, ext_c)], s,
            sems.at[k])
        for k, (r, s) in enumerate(ins)
    ]
    for c in cps:
        c.start()
    for c in cps:
        c.wait()

    src = src_s[:]
    u = u_s[:]
    v = v_s[:]
    ou, ov = (ou_s[:], ov_s[:]) if has_orig else (u, v)
    flf = jnp.where(fl_s[:] == FLUID, 1.0, 0.0)
    fluid = flf > 0.5
    fl_ok = flf if not sample_outside else jnp.ones_like(flf)

    th, tw = src.shape
    yy = jax.lax.broadcasted_iota(I32, (th, tw), 0) + row0
    xx = jax.lax.broadcasted_iota(I32, (th, tw), 1) + col0
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5

    # ---- scalar pipeline (== _advect_scalar_kernel) ----
    ccx = _border_zero(0.5 * (u + _shift(u, 0, 1)), row0, col0, h, w)
    ccy = _border_zero(0.5 * (v + _shift(v, 1, 0)), row0, col0, h, w)

    def sl_scalar(field, sdt):
        if line_trace:
            dxv = jnp.clip(-sdt * ccx, -D, D)
            dyv = jnp.clip(-sdt * ccy, -D, D)
            bx, by = _line_trace_tile(
                cx, cy, dxv, dyv, 1.0 - flf, D, row0, col0, h, w
            )
        else:
            bx = cx - sdt * ccx
            by = cy - sdt * ccy
        if sample_outside:
            val = _interpol_window_tile(field, bx, by, D, row0, col0, h, w)
        else:
            val = _interpol_fluid_window_tile(
                field, flf, bx, by, D, row0, col0, h, w
            )
        return jnp.where(fluid, val, field), bx, by

    s_fwd, fx, fy = sl_scalar(src, dt)
    s_fwd = _border_zero(s_fwd, row0, col0, h, w)
    fwd_px = jnp.where(fluid, fx, cx)
    fwd_py = jnp.where(fluid, fy, cy)
    s_bwd, _, _ = sl_scalar(s_fwd, -dt)
    s_bwd = _border_zero(s_bwd, row0, col0, h, w)
    s_dst = jnp.where(fluid, s_fwd + strength * 0.5 * (src - s_bwd), s_fwd)
    s_out = _clamp_scalar_tile(
        s_dst, src, s_fwd, fl_ok, fwd_px, fwd_py, D, row0, col0, h, w
    )
    bmask = (xx < 1) | (xx > w - 2) | (yy < 1) | (yy > h - 2)
    s_out = jnp.where(bmask, s_dst, s_out)

    # ---- velocity pipeline (== _advect_vel_kernel) ----
    mac_x_u = _border_zero(u, row0, col0, h, w)
    mac_x_v = _border_zero(
        0.25 * (v + _shift(v, 0, -1) + _shift(v, 1, 0) + _shift(v, 1, -1)),
        row0, col0, h, w,
    )
    mac_y_u = _border_zero(
        0.25 * (u + _shift(u, -1, 0) + _shift(u, 0, 1) + _shift(u, -1, 1)),
        row0, col0, h, w,
    )
    mac_y_v = _border_zero(v, row0, col0, h, w)

    def sl_vel(fu, fv, sdt):
        su = _interpol_window_tile(
            fu, cx - sdt * mac_x_u, cy - sdt * mac_x_v, D, row0, col0, h, w
        )
        sv = _interpol_window_tile(
            fv, cx - sdt * mac_y_u, cy - sdt * mac_y_v, D, row0, col0, h, w
        )
        return jnp.where(fluid, su, fu), jnp.where(fluid, sv, fv)

    fwd_u, fwd_v = sl_vel(ou, ov, dt)
    fwd_u = _border_zero(fwd_u, row0, col0, h, w)
    fwd_v = _border_zero(fwd_v, row0, col0, h, w)
    bwd_u, bwd_v = sl_vel(fwd_u, fwd_v, -dt)
    bwd_u = _border_zero(bwd_u, row0, col0, h, w)
    bwd_v = _border_zero(bwd_v, row0, col0, h, w)

    fl_xm = _shift(flf, 0, -1) > 0.5
    fl_ym = _shift(flf, -1, 0) > 0.5
    skip_u = (~fluid) | ((xx > 0) & (~fl_xm))
    skip_v = (~fluid) | ((yy > 0) & (~fl_ym))
    dst_u = jnp.where(skip_u, fwd_u, fwd_u + strength * 0.5 * (ou - bwd_u))
    dst_v = jnp.where(skip_v, fwd_v, fwd_v + strength * 0.5 * (ov - bwd_v))

    out_u = _clamp_mac_tile(dst_u, ou, mac_x_u * dt, mac_x_v * dt, D,
                            row0, col0, h, w)
    out_v = _clamp_mac_tile(dst_v, ov, mac_y_u * dt, mac_y_v * dt, D,
                            row0, col0, h, w)
    out_u = _border_zero(out_u, row0, col0, h, w)
    out_v = _border_zero(out_v, row0, col0, h, w)

    out_rho_ref[0] = s_out[halo:halo + block, halo_c:halo_c + cw]
    out_u_ref[0] = out_u[halo:halo + block, halo_c:halo_c + cw]
    out_v_ref[0] = out_v[halo:halo + block, halo_c:halo_c + cw]


def advect_all_pallas(
    dt, src, U, flags, maccormack_strength: float = 0.75,
    sample_outside_fluid: bool = False, max_disp: int = 4,
    block: int = 64, interpret: bool = False, line_trace: bool = False,
    orig=None,
):
    """Scalar + MAC velocity advection fused in one pallas_call.

    == (advect_scalar_pallas(dt, src, U, flags, ...),
        advect_velocity_pallas(dt, U, flags, ..., orig=orig)) — both
    pipelines consume the SAME pre-advection U, exactly as the step does
    (ref: pytorch/lib/simulate.py:72-107 advects density then velocity with
    the un-advected field). Returns (rho', U')."""
    b, h, w = src.shape
    assert h % block == 0, (h, block)
    halo = -(-(2 * (max_disp + 1)) // 8) * 8
    ext = block + 2 * halo
    n_rb = h // block
    has_orig = orig is not None

    cw, halo_c = _pick_cols(w)
    wp = -(-w // cw) * cw
    ext_c = cw + 2 * halo_c
    n_cb = wp // cw
    pad = ((0, 0), (halo, halo), (halo_c, wp - w + halo_c))
    args = [jnp.pad(src, pad), jnp.pad(U[:, 0], pad), jnp.pad(U[:, 1], pad),
            jnp.pad(flags, pad)]
    scratch = [
        pltpu.VMEM((ext, ext_c), F32),
        pltpu.VMEM((ext, ext_c), F32),
        pltpu.VMEM((ext, ext_c), F32),
        pltpu.VMEM((ext, ext_c), I32),
    ]
    if has_orig:
        args += [jnp.pad(orig[:, 0], pad), jnp.pad(orig[:, 1], pad)]
        scratch += [pltpu.VMEM((ext, ext_c), F32),
                    pltpu.VMEM((ext, ext_c), F32)]

    kernel = partial(
        _advect_all_kernel,
        D=max_disp, dt=float(dt), strength=float(maccormack_strength),
        sample_outside=bool(sample_outside_fluid),
        block=block, halo=halo, cw=cw, halo_c=halo_c, h=h, w=w,
        line_trace=bool(line_trace), has_orig=has_orig,
    )
    out_spec = pl.BlockSpec((1, block, cw), lambda bi, rb, cb: (bi, rb, cb))
    grid_spec = pl.GridSpec(
        grid=(b, n_rb, n_cb),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * len(args),
        out_specs=[out_spec, out_spec, out_spec],
        scratch_shapes=scratch + [pltpu.SemaphoreType.DMA((len(args),))],
    )
    rho, out_u, out_v = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wp), F32),
            jax.ShapeDtypeStruct((b, h, wp), F32),
            jax.ShapeDtypeStruct((b, h, wp), F32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(*args)
    return rho[..., :w], jnp.stack([out_u, out_v], axis=1)[..., :w]


def _pick_cols(w: int, wide: int = 1024, cw_wide: int = 512):
    """Column-tiling plan: (cw, halo_c). Narrow grids run as one lane
    block (cw = 128-padded w, no halo); wide grids use ``cw_wide``-lane
    blocks with a 128-lane halo so the unrolled window ops stay within the
    vector-register budget."""
    wp = -(-w // 128) * 128
    if wp <= wide:
        return wp, 0
    return cw_wide, 128


def pick_block(h: int, prefer: int = 64):
    """Largest row-block size (multiple of 8, <= ``prefer``) dividing ``h``,
    or None. The fused kernels only need h % block == 0 — the lane (w)
    dimension is handled by padding to the 128 tile inside the wrappers —
    so e.g. the reference's 8000x800 cylinder runs the fast path with
    block=40. This helper replaces the old hard 128-multiple gate."""
    for bsize in range(min(prefer, h), 7, -1):
        if bsize % 8 == 0 and h % bsize == 0:
            return bsize
    return None
