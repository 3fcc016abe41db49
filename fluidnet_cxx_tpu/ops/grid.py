"""MAC-grid sampling library (TPU-native rewrite of the reference's grid ops).

Semantics mirror the vectorised ATen implementation cell-for-cell
(ref: pytorch/lib/fluid/cpp/grid.cpp) but are expressed as pure-jnp gathers
and shifts over ``(b, h, w)`` arrays so XLA can fuse them. 2-D only for now;
the reference's 3-D paths are declared buggy (ref: README.md:31).
"""
import jax.numpy as jnp

from ..celltype import FLUID
from .common import F32, I32, border_mask, gather2d, nb


def get_dx(h: int, w: int, d: int = 1) -> float:
    """dx = 1 / max(dims)  (ref: grid.cpp:8-11)."""
    return 1.0 / float(max(d, h, w))


def get_centered(U):
    """MAC -> cell-centre averaged velocity, zero on the 1-ring border.

    cc_u(i,j) = 0.5*(u(i,j) + u(i+1,j)); cc_v likewise in y.
    (ref: grid.cpp:274-312 — computed on the interior only there; here we
    compute everywhere and zero the ring, which is identical.)
    """
    b, _, h, w = U.shape
    u, v = U[:, 0], U[:, 1]
    cu = 0.5 * (u + nb(u, 0, 1))
    cv = 0.5 * (v + nb(v, 1, 0))
    keep = ~border_mask(h, w, 1)
    zero = jnp.zeros_like(u)
    return jnp.stack(
        [jnp.where(keep, cu, zero), jnp.where(keep, cv, zero)], axis=1
    )


def get_at_mac_x(U):
    """Full velocity vector sampled at the x-face (MAC-x) position.

    v_x = u(i,j); v_y = 0.25*(v(i,j)+v(i-1,j)+v(i,j+1)+v(i-1,j+1)).
    Zero on the 1-ring border. (ref: grid.cpp:314-357)
    """
    b, _, h, w = U.shape
    u, v = U[:, 0], U[:, 1]
    vy = 0.25 * (v + nb(v, 0, -1) + nb(v, 1, 0) + nb(v, 1, -1))
    keep = ~border_mask(h, w, 1)
    zero = jnp.zeros_like(u)
    return jnp.stack(
        [jnp.where(keep, u, zero), jnp.where(keep, vy, zero)], axis=1
    )


def get_at_mac_y(U):
    """Full velocity vector sampled at the y-face (MAC-y) position.

    v_x = 0.25*(u(i,j)+u(i,j-1)+u(i+1,j)+u(i+1,j-1)); v_y = v(i,j).
    Zero on the 1-ring border. (ref: grid.cpp:359-402)
    """
    b, _, h, w = U.shape
    u, v = U[:, 0], U[:, 1]
    ux = 0.25 * (u + nb(u, -1, 0) + nb(u, 0, 1) + nb(u, -1, 1))
    keep = ~border_mask(h, w, 1)
    zero = jnp.zeros_like(u)
    return jnp.stack(
        [jnp.where(keep, ux, zero), jnp.where(keep, v, zero)], axis=1
    )


def _corner_setup(shape_hw, pos):
    """Common bilinear-corner bookkeeping (ref: grid.cpp:25-52).

    Returns integer corner indices (x0, y0) clamped to [0, dim-2] and the
    clamped lerp weights (s0, s1, t0, t1).
    """
    h, w = shape_hw
    p = pos - 0.5
    # Truncation toward zero, matching ATen's toType(kLong).
    pos0 = jnp.trunc(p).astype(I32)
    s1 = jnp.clip(p[:, 0] - pos0[:, 0].astype(F32), 0.0, 1.0)
    t1 = jnp.clip(p[:, 1] - pos0[:, 1].astype(F32), 0.0, 1.0)
    s0 = 1.0 - s1
    t0 = 1.0 - t1
    x0 = jnp.clip(pos0[:, 0], 0, w - 2)
    y0 = jnp.clip(pos0[:, 1], 0, h - 2)
    return x0, y0, s0, s1, t0, t1


def interpol(src, pos):
    """Plain bilinear sample of scalar ``src`` at positions ``pos``.

    (ref: grid.cpp:13-76)
    """
    _, h, w = src.shape
    x0, y0, s0, s1, t0, t1 = _corner_setup((h, w), pos)
    Ia = gather2d(src, y0, x0)
    Ib = gather2d(src, y0 + 1, x0)
    Ic = gather2d(src, y0, x0 + 1)
    Id = gather2d(src, y0 + 1, x0 + 1)
    return (Ia * t0 + Ib * t1) * s0 + (Ic * t0 + Id * t1) * s1


def _interp1d_with_fluid(va, fa, vb, fb, ta, tb):
    """Fluid-aware 1-D lerp (ref: grid.cpp:78-96).

    Non-fluid endpoints are dropped: both non-fluid -> 0 (flagged invalid);
    one fluid -> take it unweighted; both fluid -> plain lerp.
    """
    m0 = (~fa) & (~fb)
    m1 = (~fa) & fb
    m2 = fa & (~fb)
    val = jnp.where(
        m0,
        0.0,
        jnp.where(m1, vb, jnp.where(m2, va, va * ta + vb * tb)),
    )
    return val, ~m0


def interpol_with_fluid(src, flags, pos):
    """Bilinear sample that ignores non-fluid corners, falling back to the
    plain bilinear sample when all four corners are non-fluid.

    (ref: grid.cpp:118-269, 2-D branch :231-268)
    """
    _, h, w = src.shape
    x0, y0, s0, s1, t0, t1 = _corner_setup((h, w), pos)

    def at(yi, xi):
        return gather2d(src, yi, xi), gather2d(flags, yi, xi) == FLUID

    Ia, fa = at(y0, x0)
    Ib, fb = at(y0 + 1, x0)
    Ic, fc = at(y0, x0 + 1)
    Id, fd = at(y0 + 1, x0 + 1)

    Iab, fab = _interp1d_with_fluid(Ia, fa, Ib, fb, t0, t1)
    Icd, fcd = _interp1d_with_fluid(Ic, fc, Id, fd, t0, t1)
    Ival, fval = _interp1d_with_fluid(Iab, fab, Icd, fcd, s0, s1)
    return jnp.where(fval, Ival, interpol(src, pos))


def interpol_component(U, pos, c: int):
    """Bilinear sample of a single velocity component (ref: grid.cpp:448-511)."""
    return interpol(U[:, c], pos)


def curl2d(U):
    """z-vorticity at cell centres: dv/dx - du/dy (central differences),
    zero on the border. Diagnostic only.

    The reference's ``curl`` (grid.cpp:513-561) contains sign errors and is
    unused by any caller; we implement the correct centred curl instead.
    """
    _, _, h, w = U.shape
    u, v = U[:, 0], U[:, 1]
    dvdx = 0.5 * (nb(v, 0, 1) - nb(v, 0, -1))
    dudy = 0.5 * (nb(u, 1, 0) - nb(u, -1, 0))
    keep = ~border_mask(h, w, 1)
    return jnp.where(keep, dvdx - dudy, 0.0)
