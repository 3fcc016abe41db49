"""Bounded-window sampling: the TPU-native replacement for gathers.

XLA:TPU executes arbitrary gathers on the scalar core (~2 ms per 512^2
gather measured on v5e) — they dominate semi-Lagrangian advection. But the
back-trace displacement is CFL-bounded: with |disp| <= D cells, a bilinear
sample is exactly a weighted sum over the (2D+2)^2 window of statically
shifted arrays, which compiles to fused VPU select/FMA passes at HBM
bandwidth. Every sampling primitive of the advection pipeline is provided
here in window form with semantics identical to the gather versions
(ops/grid.py, ops/advection.py) whenever the true displacement is <= D;
positions are clamped to the window otherwise.

D (``max_disp``) is a static kernel parameter; default 4 covers dt*|u| up to
4 cells/step, far beyond the shipped configs' CFL numbers.
"""
import jax.numpy as jnp

from ..celltype import FLUID
from .common import F32, I32, cell_index_grid, nb


def clamp_pos_to_window(pos, D: int):
    """Clamp absolute positions to each cell's own centre +- D."""
    b, _, h, w = pos.shape
    xx, yy = cell_index_grid(b, h, w)
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    return jnp.stack(
        [
            jnp.clip(pos[:, 0], cx - D, cx + D),
            jnp.clip(pos[:, 1], cy - D, cy + D),
        ],
        axis=1,
    )


def _corner_offsets(pos, D: int, h: int, w: int):
    """Bilinear corner bookkeeping in offset form.

    Returns (ox0, oy0, s1, t1): integer offsets of the lower corner from the
    cell's own index (each in [-D, D]) and the clamped lerp weights —
    identical maths to grid._corner_setup (pos-0.5, trunc, clamp to
    [0, dim-2]).
    """
    b = pos.shape[0]
    xx, yy = cell_index_grid(b, h, w)
    p = pos - 0.5
    pos0 = jnp.trunc(p).astype(I32)
    s1 = jnp.clip(p[:, 0] - pos0[:, 0].astype(F32), 0.0, 1.0)
    t1 = jnp.clip(p[:, 1] - pos0[:, 1].astype(F32), 0.0, 1.0)
    x0 = jnp.clip(pos0[:, 0], 0, w - 2)
    y0 = jnp.clip(pos0[:, 1], 0, h - 2)
    return x0 - xx, y0 - yy, s1, t1


def interpol_window(src, pos, D: int = 4):
    """Plain bilinear sample, window form (== grid.interpol for |disp|<=D)."""
    _, h, w = src.shape
    pos = clamp_pos_to_window(pos, D)
    ox0, oy0, s1, t1 = _corner_offsets(pos, D, h, w)
    s0, t0 = 1.0 - s1, 1.0 - t1

    wx = {
        ox: s0 * (ox0 == ox) + s1 * (ox0 == ox - 1)
        for ox in range(-D, D + 2)
    }
    out = jnp.zeros_like(src)
    for oy in range(-D, D + 2):
        wy = t0 * (oy0 == oy) + t1 * (oy0 == oy - 1)
        row = jnp.zeros_like(src)
        for ox in range(-D, D + 2):
            row = row + wx[ox] * nb(src, oy, ox)
        out = out + wy * row
    return out


def _extract_corners(src, flags, pos, D: int):
    """Corner values + fluid masks for the fluid-aware bilinear sample.

    Returns (Va, Vb, Vc, Vd, Fa, Fb, Fc, Fd, s1, t1) where a=(y0,x0),
    b=(y0+1,x0), c=(y0,x0+1), d=(y0+1,x0+1).
    """
    _, h, w = src.shape
    ox0, oy0, s1, t1 = _corner_offsets(pos, D, h, w)

    zero = jnp.zeros_like(src)
    Va = Vb = Vc = Vd = zero
    Fa = Fb = Fc = Fd = zero
    fl = (flags == FLUID).astype(F32)
    mx0 = {ox: ox0 == ox for ox in range(-D, D + 2)}
    mx1 = {ox: ox0 == ox - 1 for ox in range(-D, D + 2)}
    for oy in range(-D, D + 2):
        my0 = oy0 == oy
        my1 = oy0 == oy - 1
        rowV0 = rowV1 = rowF0 = rowF1 = zero
        for ox in range(-D, D + 2):
            s = nb(src, oy, ox)
            f = nb(fl, oy, ox)
            rowV0 = rowV0 + jnp.where(mx0[ox], s, 0.0)
            rowV1 = rowV1 + jnp.where(mx1[ox], s, 0.0)
            rowF0 = rowF0 + jnp.where(mx0[ox], f, 0.0)
            rowF1 = rowF1 + jnp.where(mx1[ox], f, 0.0)
        Va = Va + jnp.where(my0, rowV0, 0.0)
        Vb = Vb + jnp.where(my1, rowV0, 0.0)
        Vc = Vc + jnp.where(my0, rowV1, 0.0)
        Vd = Vd + jnp.where(my1, rowV1, 0.0)
        Fa = Fa + jnp.where(my0, rowF0, 0.0)
        Fb = Fb + jnp.where(my1, rowF0, 0.0)
        Fc = Fc + jnp.where(my0, rowF1, 0.0)
        Fd = Fd + jnp.where(my1, rowF1, 0.0)
    return Va, Vb, Vc, Vd, Fa > 0.5, Fb > 0.5, Fc > 0.5, Fd > 0.5, s1, t1


def interpol_with_fluid_window(src, flags, pos, D: int = 4):
    """Fluid-aware bilinear sample, window form
    (== grid.interpol_with_fluid for |disp| <= D)."""
    from .grid import _interp1d_with_fluid

    pos = clamp_pos_to_window(pos, D)
    Va, Vb, Vc, Vd, Fa, Fb, Fc, Fd, s1, t1 = _extract_corners(
        src, flags, pos, D
    )
    s0, t0 = 1.0 - s1, 1.0 - t1
    Iab, fab = _interp1d_with_fluid(Va, Fa, Vb, Fb, t0, t1)
    Icd, fcd = _interp1d_with_fluid(Vc, Fc, Vd, Fd, t0, t1)
    Ival, fval = _interp1d_with_fluid(Iab, fab, Icd, fcd, s0, s1)
    # all-non-fluid fallback: plain bilinear (grid.cpp:227-229). Reuse the
    # already-extracted corners (identical to interpol_window here).
    plain = (Va * t0 + Vb * t1) * s0 + (Vc * t0 + Vd * t1) * s1
    return jnp.where(fval, Ival, plain)


def clamp_bounds_scalar_window(src, pos, flags, sample_outside, D: int = 4):
    """Window form of advection._clamp_bounds_scalar: min/max/count of src
    over the fluid cells in the 3x3 neighbourhood of the cell containing
    ``pos``. Returns (do_clamp, minv, maxv)."""
    b, h, w = src.shape
    pos = clamp_pos_to_window(pos, D)
    xx, yy = cell_index_grid(b, h, w)
    i0 = jnp.clip(jnp.trunc(pos[:, 0]).astype(I32), 0, w - 1)
    j0 = jnp.clip(jnp.trunc(pos[:, 1]).astype(I32), 0, h - 1)
    oi0 = i0 - xx
    oj0 = j0 - yy

    fl_ok = (flags == FLUID) | bool(sample_outside)
    minv = jnp.full_like(src, jnp.inf)
    maxv = jnp.full_like(src, -jnp.inf)
    ncells = jnp.zeros(src.shape, I32)
    for oy in range(-D - 1, D + 2):
        my = jnp.abs(oj0 - oy) <= 1
        # global row in bounds (rolls wrap otherwise)
        row_ok = (yy + oy >= 0) & (yy + oy < h)
        for ox in range(-D - 1, D + 2):
            m = (
                my
                & (jnp.abs(oi0 - ox) <= 1)
                & row_ok
                & (xx + ox >= 0)
                & (xx + ox < w)
                & nb(fl_ok, oy, ox)
            )
            s = nb(src, oy, ox)
            minv = jnp.where(m, jnp.minimum(minv, s), minv)
            maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
            ncells = ncells + m.astype(I32)
    return ncells >= 1, minv, maxv


def clamp_component_mac_window(dst_c, orig_c, vel_mac_dt, D: int = 4):
    """Window form of advection._clamp_component_mac: clamp dst_c to the
    min/max of orig_c over the bilinear corners of the two integer positions
    pos -/+ vel_mac*dt."""
    b, h, w = orig_c.shape
    xx, yy = cell_index_grid(b, h, w)
    vx = jnp.clip(vel_mac_dt[:, 0], -D, D)
    vy = jnp.clip(vel_mac_dt[:, 1], -D, D)

    def offsets(sign):
        cx = (xx.astype(F32) + sign * vx).astype(I32)  # trunc toward zero
        cy = (yy.astype(F32) + sign * vy).astype(I32)
        return (
            jnp.clip(cx, 0, w - 2) - xx,
            jnp.clip(cy, 0, h - 2) - yy,
        )

    oiM, ojM = offsets(-1.0)
    oiP, ojP = offsets(1.0)

    minv = jnp.full_like(orig_c, jnp.inf)
    maxv = jnp.full_like(orig_c, -jnp.inf)
    for oy in range(-D, D + 2):
        myM = (ojM == oy) | (ojM == oy - 1)
        myP = (ojP == oy) | (ojP == oy - 1)
        for ox in range(-D, D + 2):
            m = (myM & ((oiM == ox) | (oiM == ox - 1))) | (
                myP & ((oiP == ox) | (oiP == ox - 1))
            )
            s = nb(orig_c, oy, ox)
            minv = jnp.where(m, jnp.minimum(minv, s), minv)
            maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
    return jnp.maximum(jnp.minimum(dst_c, maxv), minv)


def make_blocked_lookup_window(flags, D: int = 4):
    """Window-form point lookup 'is the cell containing pos non-fluid?' for
    the line trace (== line_trace._is_blocked_cell for |pos - centre| <= D).
    Out-of-window/out-of-domain positions return False, matching the gather
    version's out-of-domain semantics."""
    b, h, w = flags.shape
    xx, yy = cell_index_grid(b, h, w)
    blocked = (flags != FLUID).astype(F32)

    def lookup(pos):
        ix = jnp.trunc(pos[:, 0]).astype(I32) - xx
        iy = jnp.trunc(pos[:, 1]).astype(I32) - yy
        acc = jnp.zeros((b, h, w), F32)
        for oy in range(-D, D + 1):
            my = iy == oy
            for ox in range(-D, D + 1):
                acc = acc + jnp.where(
                    my & (ix == ox), nb(blocked, oy, ox), 0.0
                )
        out = (
            (pos[:, 0] <= 0)
            | (pos[:, 0] >= w)
            | (pos[:, 1] <= 0)
            | (pos[:, 1] >= h)
        )
        return (acc > 0.5) & (~out)

    return lookup


def max_displacement(U, dt):
    """Largest per-axis back-trace displacement (in cells) the advection
    will attempt this step: dt * max|centered velocity|. Cheap (one reduce)
    — the runtime CFL guard for the bounded-window engines."""
    from .grid import get_centered

    cc = get_centered(U)
    return dt * jnp.max(jnp.abs(cc))


def max_displacement3(U, dt):
    """3-D twin of max_displacement."""
    from .ops3d import get_centered3

    cc = get_centered3(U)
    return dt * jnp.max(jnp.abs(cc))
