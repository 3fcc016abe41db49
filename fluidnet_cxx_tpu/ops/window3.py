"""Bounded-window sampling in 3-D: gather-free trilinear interpolation.

3-D twin of ``ops/window.py``: XLA:TPU executes arbitrary gathers on the
scalar core, so the semi-Lagrangian back-trace is reformulated as a weighted
sum over statically shifted arrays. With per-axis displacement bounded by
``D`` cells, a trilinear sample touches corners inside the (2D+2)^3 offset
cube; each term is a masked VPU FMA over a rolled array, which XLA fuses
into bandwidth-bound passes.

The cost grows with D^3, so the 3-D default is D=2 (dt*|u| up to 2
cells/step per axis — the 3-D demo configs run well inside that); positions
beyond the window are clamped, identically to the 2-D engine's contract.

Semantics match the gather versions in ``ops/ops3d.py`` exactly whenever the
true displacement is <= D (verified by tests/test_ops3d.py).
"""
import jax.numpy as jnp

from ..celltype import FLUID
from .common import F32, I32
from .ops3d import nb3


def _index_grids3(b, d, h, w):
    zz = jnp.broadcast_to(jnp.arange(d, dtype=I32)[None, :, None, None],
                          (b, d, h, w))
    yy = jnp.broadcast_to(jnp.arange(h, dtype=I32)[None, None, :, None],
                          (b, d, h, w))
    xx = jnp.broadcast_to(jnp.arange(w, dtype=I32)[None, None, None, :],
                          (b, d, h, w))
    return zz, yy, xx


def clamp_pos_to_window3(pos, D: int):
    """Clamp absolute positions (channels x, y, z) to each cell's own centre
    +- D per axis."""
    b, _, d, h, w = pos.shape
    zz, yy, xx = _index_grids3(b, d, h, w)
    cx = xx.astype(F32) + 0.5
    cy = yy.astype(F32) + 0.5
    cz = zz.astype(F32) + 0.5
    return jnp.stack(
        [
            jnp.clip(pos[:, 0], cx - D, cx + D),
            jnp.clip(pos[:, 1], cy - D, cy + D),
            jnp.clip(pos[:, 2], cz - D, cz + D),
        ],
        axis=1,
    )


def _corner_offsets3(pos, d, h, w):
    """Trilinear corner bookkeeping in offset form (3-D twin of
    window._corner_offsets): integer offsets of the lower corner from the
    cell's own index and the clamped lerp weights. Identical maths to
    ops3d.interpol3 (pos-0.5, trunc, clamp to [0, dim-2])."""
    b = pos.shape[0]
    zz, yy, xx = _index_grids3(b, d, h, w)
    p = pos - 0.5
    p0 = jnp.trunc(p).astype(I32)
    s1 = jnp.clip(p[:, 0] - p0[:, 0].astype(F32), 0.0, 1.0)
    t1 = jnp.clip(p[:, 1] - p0[:, 1].astype(F32), 0.0, 1.0)
    f1 = jnp.clip(p[:, 2] - p0[:, 2].astype(F32), 0.0, 1.0)
    x0 = jnp.clip(p0[:, 0], 0, w - 2)
    y0 = jnp.clip(p0[:, 1], 0, h - 2)
    z0 = jnp.clip(p0[:, 2], 0, d - 2)
    return x0 - xx, y0 - yy, z0 - zz, s1, t1, f1


def interpol_window3(src, pos, D: int = 2):
    """Plain trilinear sample, window form (== ops3d.interpol3 for
    per-axis |disp| <= D)."""
    _, d, h, w = src.shape
    pos = clamp_pos_to_window3(pos, D)
    ox0, oy0, oz0, s1, t1, f1 = _corner_offsets3(pos, d, h, w)
    s0, t0, f0 = 1.0 - s1, 1.0 - t1, 1.0 - f1

    # Per-axis corner weights: weight of offset o is (frac0 if lower corner
    # lands on o) + (frac1 if upper corner lands on o).
    wx = {ox: s0 * (ox0 == ox) + s1 * (ox0 == ox - 1)
          for ox in range(-D, D + 2)}
    wy = {oy: t0 * (oy0 == oy) + t1 * (oy0 == oy - 1)
          for oy in range(-D, D + 2)}
    out = jnp.zeros_like(src)
    for oz in range(-D, D + 2):
        wz = f0 * (oz0 == oz) + f1 * (oz0 == oz - 1)
        plane = jnp.zeros_like(src)
        for oy in range(-D, D + 2):
            row = jnp.zeros_like(src)
            for ox in range(-D, D + 2):
                row = row + wx[ox] * nb3(src, oz, oy, ox)
            plane = plane + wy[oy] * row
        out = out + wz * plane
    return out


def clamp_bounds_scalar_window3(src, pos, flags, D: int = 2):
    """Window form of the 3^3-fluid-neighbourhood clamp bounds in
    ops3d.advect_scalar3: min/max/count of ``src`` over fluid cells in the
    3x3x3 neighbourhood of the cell containing ``pos``.
    Returns (has_fluid, minv, maxv)."""
    b, d, h, w = src.shape
    pos = clamp_pos_to_window3(pos, D)
    zz, yy, xx = _index_grids3(b, d, h, w)
    i0 = jnp.clip(jnp.trunc(pos[:, 0]).astype(I32), 0, w - 1) - xx
    j0 = jnp.clip(jnp.trunc(pos[:, 1]).astype(I32), 0, h - 1) - yy
    k0 = jnp.clip(jnp.trunc(pos[:, 2]).astype(I32), 0, d - 1) - zz

    fl = flags == FLUID
    minv = jnp.full_like(src, jnp.inf)
    maxv = jnp.full_like(src, -jnp.inf)
    n = jnp.zeros(src.shape, I32)
    R = D + 1  # landing-cell offset is in [-D, D]; neighbourhood adds 1
    for oz in range(-R, R + 1):
        mz = (jnp.abs(k0 - oz) <= 1) & (zz + oz >= 0) & (zz + oz < d)
        for oy in range(-R, R + 1):
            my = mz & (jnp.abs(j0 - oy) <= 1) & (yy + oy >= 0) & (yy + oy < h)
            for ox in range(-R, R + 1):
                m = (
                    my & (jnp.abs(i0 - ox) <= 1)
                    & (xx + ox >= 0) & (xx + ox < w)
                    & nb3(fl, oz, oy, ox)
                )
                s = nb3(src, oz, oy, ox)
                minv = jnp.where(m, jnp.minimum(minv, s), minv)
                maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
                n = n + m.astype(I32)
    return n >= 1, minv, maxv


def clamp_component_mac_window3(dst_c, orig_c, vel_mac_dt, D: int = 2):
    """Window form of the 3-D MAC corner clamp (ops3d.advect_velocity3):
    clamp dst_c to the min/max of orig_c over the 8 trilinear corners of the
    two integer positions pos -/+ vel_mac*dt."""
    b, d, h, w = orig_c.shape
    zz, yy, xx = _index_grids3(b, d, h, w)
    vx = jnp.clip(vel_mac_dt[:, 0], -D, D)
    vy = jnp.clip(vel_mac_dt[:, 1], -D, D)
    vz = jnp.clip(vel_mac_dt[:, 2], -D, D)

    def offsets(sign):
        # trunc toward zero, like the gather version's .astype(I32)
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

    minv = jnp.full_like(orig_c, jnp.inf)
    maxv = jnp.full_like(orig_c, -jnp.inf)
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
                s = nb3(orig_c, oz, oy, ox)
                minv = jnp.where(m, jnp.minimum(minv, s), minv)
                maxv = jnp.where(m, jnp.maximum(maxv, s), maxv)
    return jnp.maximum(jnp.minimum(dst_c, maxv), minv)


def make_blocked_lookup_window3(flags, D: int = 2):
    """Window-form point lookup 'is the cell containing pos non-fluid?' for
    the 3-D line trace (== line_trace3 gather lookup for |pos-centre| <= D).
    Out-of-window/out-of-domain positions return False."""
    b, d, h, w = flags.shape
    zz, yy, xx = _index_grids3(b, d, h, w)
    blocked = (flags != FLUID).astype(F32)

    def lookup(pos):
        ix = jnp.trunc(pos[:, 0]).astype(I32) - xx
        iy = jnp.trunc(pos[:, 1]).astype(I32) - yy
        iz = jnp.trunc(pos[:, 2]).astype(I32) - zz
        acc = jnp.zeros((b, d, h, w), F32)
        for oz in range(-D, D + 1):
            mz = iz == oz
            for oy in range(-D, D + 1):
                my = mz & (iy == oy)
                for ox in range(-D, D + 1):
                    acc = acc + jnp.where(
                        my & (ix == ox), nb3(blocked, oz, oy, ox), 0.0
                    )
        out = (
            (pos[:, 0] <= 0) | (pos[:, 0] >= w)
            | (pos[:, 1] <= 0) | (pos[:, 1] >= h)
            | (pos[:, 2] <= 0) | (pos[:, 2] >= d)
        )
        return (acc > 0.5) & (~out)

    return lookup
