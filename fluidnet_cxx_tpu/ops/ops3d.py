"""3-D MAC-grid kernels.

The reference declares its 3-D paths buggy and unsupported
(ref: README.md:31, pytorch/lib/fluid/cpp/advection.py:58); these are the
clean generalisations of the (tested) 2-D semantics to 3-D, following the
reference's 3-D code paths where they are well-defined (6-neighbour Jacobi
with obstacle substitution, ref: fluids_init.cpp:858-994; 3-channel MAC
divergence/update, ref: velocity_divergence.py:52-65).

Layout: scalars ``(b, d, h, w)``; MAC velocity ``(b, 3, d, h, w)`` with
channels (u, v, w) on x/y/z faces; flags int32. ``w`` stays the lane axis.
Advection uses gather sampling (a 3-D window engine is future work).
"""
import jax
import jax.numpy as jnp

from ..celltype import EMPTY, FLUID, OBSTACLE, STICK
from .common import F32, I32

_AXES = ((0, 0, 1), (0, 1, 0), (1, 0, 0))  # (dz, dy, dx) per channel


def nb3(a, dz, dy, dx):
    """result[..., z, y, x] = a[..., z+dz, y+dy, x+dx] (circular)."""
    if dz == 0 and dy == 0 and dx == 0:
        return a
    return jnp.roll(a, shift=(-dz, -dy, -dx), axis=(-3, -2, -1))


def border_mask3(d, h, w, bnd=1):
    zz = jnp.arange(d, dtype=I32)[:, None, None]
    yy = jnp.arange(h, dtype=I32)[None, :, None]
    xx = jnp.arange(w, dtype=I32)[None, None, :]
    return (
        (xx < bnd) | (xx > w - 1 - bnd)
        | (yy < bnd) | (yy > h - 1 - bnd)
        | (zz < bnd) | (zz > d - 1 - bnd)
    )


def empty_domain3(b, d, h, w, bnd=1):
    flags = jnp.where(border_mask3(d, h, w, bnd), OBSTACLE, FLUID)
    return jnp.broadcast_to(flags[None], (b, d, h, w)).astype(I32)


def velocity_divergence3(U, flags):
    """rhs = -div(U) in fluid cells, interior only."""
    _, d, h, w = flags.shape
    u, v, wz = U[:, 0], U[:, 1], U[:, 2]
    rhs = (
        (u - nb3(u, 0, 0, 1))
        + (v - nb3(v, 0, 1, 0))
        + (wz - nb3(wz, 1, 0, 0))
    )
    keep = (~border_mask3(d, h, w, 1)) & (flags != OBSTACLE)
    return jnp.where(keep, rhs, 0.0)


def velocity_update3(p, U, flags):
    """U -= grad(p) with the same fluid/empty BC treatment as 2-D."""
    _, d, h, w = flags.shape
    fl = flags == FLUID
    em = flags == EMPTY
    interior = ~border_mask3(d, h, w, 1)
    outs = []
    for c, (dz, dy, dx) in enumerate(_AXES):
        fm = nb3(fl, -dz, -dy, -dx)
        e_m = nb3(em, -dz, -dy, -dx)
        p_m = nb3(p, -dz, -dy, -dx)
        vel = U[:, c]
        new = jnp.where(
            fl & fm,
            vel - (p - p_m),
            jnp.where(fl & e_m, vel - p, jnp.where(em & fm, vel + p_m, 0.0)),
        )
        outs.append(jnp.where(interior, new, vel))
    return jnp.stack(outs, axis=1)


def set_wall_bcs3(U, flags):
    """Free-slip: zero normal velocity on obstacle faces (index clamped
    at 0, like the 2-D version)."""
    fl = flags == FLUID
    ob = flags == OBSTACLE
    cont = fl | ob
    outs = []
    for c, (dz, dy, dx) in enumerate(_AXES):
        # left/down/back neighbour with index clamped at 0
        def clampshift(a):
            a2 = a
            if dx:
                a2 = jnp.concatenate([a2[..., :1], a2[..., :-1]], axis=-1)
            if dy:
                a2 = jnp.concatenate(
                    [a2[..., :1, :], a2[..., :-1, :]], axis=-2
                )
            if dz:
                a2 = jnp.concatenate(
                    [a2[..., :1, :, :], a2[..., :-1, :, :]], axis=-3
                )
            return a2

        ob_m = clampshift(ob)
        fl_m = clampshift(fl)
        kill = cont & (ob_m | (ob & fl_m))
        outs.append(jnp.where(kill, 0.0, U[:, c]))
    return jnp.stack(outs, axis=1)


def _shift_ok3(a, dz, dy, dx, d, h, w):
    """nb3 shift with an in-bounds mask (False where the roll wrapped)."""
    zz = jnp.arange(d)[None, :, None, None]
    yy = jnp.arange(h)[None, None, :, None]
    xx = jnp.arange(w)[None, None, None, :]
    ok = (
        (zz + dz >= 0) & (zz + dz < d)
        & (yy + dy >= 0) & (yy + dy < h)
        & (xx + dx >= 0) & (xx + dx < w)
    )
    return nb3(a, dz, dy, dx) & ok


def set_wall_bcs_stick3(U, flags, flags_stick):
    """No-slip (stick) walls in 3-D: the 3-axis generalisation of the 2-D
    ``set_wall_bcs_stick`` (itself a clean reimplementation of the
    reference's non-executable version, set_wall_bcs_stick.py):
      1. zero all velocity inside obstacle cells,
      2. slip BC on normal components (index clamped at 0),
      3. in stick cells, set each tangential component's ghost value to the
         negated mean of its fluid neighbours across the two tangential
         axes (1-4 contributors in 3-D),
      4. corner rule: a stick cell whose normal-minus neighbour is stick
         zeroes the component when a tangential axis has a stick neighbour
         on EXACTLY one side. A both-sided stick pair means the obstacle
         continues straight through along that axis (e.g. the extrusion
         axis of a 3-D cylinder) — an interior line, not a corner; counting
         it would kill the tangential ghost reflection on every extruded
         surface, so it is excluded (intentional divergence from the 2-D
         rule, which has no extrusion axis to protect).
    """
    _, d, h, w = flags.shape
    fl = flags == FLUID
    ob = flags == OBSTACLE
    st = flags_stick == STICK
    cont = fl | ob | st

    comps = [jnp.where(ob, 0.0, U[:, c]) for c in range(3)]

    for c, (ndz, ndy, ndx) in enumerate(_AXES):
        # 2. slip on the normal: neighbour on the minus side of the face.
        ob_m = _shift_ok3(ob, -ndz, -ndy, -ndx, d, h, w)
        fl_m = _shift_ok3(fl, -ndz, -ndy, -ndx, d, h, w)
        vel = jnp.where(cont & (ob_m | (ob & fl_m)), 0.0, comps[c])

        # 3. tangential ghost reflection from fluid neighbours along the two
        # tangential axes.
        acc = jnp.zeros_like(vel)
        cnt = jnp.zeros(vel.shape, I32)
        for ta, (tdz, tdy, tdx) in enumerate(_AXES):
            if ta == c:
                continue
            for s in (-1, 1):
                sh = (s * tdz, s * tdy, s * tdx)
                fl_t = _shift_ok3(fl, *sh, d, h, w)
                v_t = jnp.where(fl_t, nb3(vel, *sh), 0.0)
                acc = acc + v_t
                cnt = cnt + fl_t.astype(I32)
        ghost = -acc / jnp.maximum(cnt, 1).astype(F32)
        vel = jnp.where(cont & st & (cnt > 0), ghost, vel)

        # 4. corner stick cells (extrusion-safe: see docstring).
        st_nm = _shift_ok3(st, -ndz, -ndy, -ndx, d, h, w)
        st_tan = jnp.zeros(vel.shape, bool)
        for ta, (tdz, tdy, tdx) in enumerate(_AXES):
            if ta == c:
                continue
            st_m = _shift_ok3(st, -tdz, -tdy, -tdx, d, h, w)
            st_p = _shift_ok3(st, tdz, tdy, tdx, d, h, w)
            st_tan |= st_m ^ st_p
        vel = jnp.where(cont & st & st_nm & st_tan, 0.0, vel)
        comps[c] = vel

    return jnp.stack(comps, axis=1)


def add_buoyancy3(U, flags, density, gravity, rho_star, dt):
    _, d, h, w = flags.shape
    fl = flags == FLUID
    cont = fl & (~border_mask3(d, h, w, 1))
    strength = jnp.asarray(gravity, F32) * dt
    outs = []
    for c, (dz, dy, dx) in enumerate(_AXES):
        rho_m = nb3(density, -dz, -dy, -dx)
        fac = strength[c] * (0.5 * (density + rho_m) - rho_star)
        outs.append(
            jnp.where(cont & nb3(fl, -dz, -dy, -dx), U[:, c] + fac, U[:, c])
        )
    return jnp.stack(outs, axis=1)


def add_gravity3(U, flags, gravity, dt):
    _, d, h, w = flags.shape
    fl = flags == FLUID
    em = flags == EMPTY
    cont = (fl | em) & (~border_mask3(d, h, w, 1))
    force = jnp.asarray(gravity, F32) * dt
    outs = []
    for c, (dz, dy, dx) in enumerate(_AXES):
        fm = nb3(fl, -dz, -dy, -dx)
        e_m = nb3(em, -dz, -dy, -dx)
        mask = cont & (fm | (e_m & fl))
        outs.append(jnp.where(mask, U[:, c] + force[c], U[:, c]))
    return jnp.stack(outs, axis=1)


def solve_jacobi_fixed3(flags, div, iters: int, p0=None,
                        damping: float = 1.0):
    """6-neighbour Jacobi with obstacle-Neumann substitution
    (3-D twin of ops.jacobi.solve_jacobi_fixed). A non-zero ``p0``
    warm-starts the solve; ``damping`` < 1 gives the weighted-Jacobi
    smoother used by the learned-projection polish (see ops.jacobi)."""
    _, d, h, w = flags.shape
    ob = flags == OBSTACLE
    cont = (~border_mask3(d, h, w, 1)) & (~ob)
    nbs = [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0), (-1, 0, 0), (1, 0, 0)]
    ob_n = [nb3(ob, *s) for s in nbs]
    w_ = float(damping)

    def sweep(_, p):
        acc = div
        for mask, s in zip(ob_n, nbs):
            acc = acc + jnp.where(mask, p, nb3(p, *s))
        upd = acc / 6.0
        if w_ != 1.0:
            upd = (1.0 - w_) * p + w_ * upd
        return jnp.where(cont, upd, 0.0)

    if p0 is None:
        p0 = jnp.zeros_like(div)
    return jax.lax.fori_loop(0, iters, sweep, p0)


def get_centered3(U):
    _, _, d, h, w = U.shape
    u, v, wz = U[:, 0], U[:, 1], U[:, 2]
    keep = ~border_mask3(d, h, w, 1)
    zero = jnp.zeros_like(u)
    return jnp.stack(
        [
            jnp.where(keep, 0.5 * (u + nb3(u, 0, 0, 1)), zero),
            jnp.where(keep, 0.5 * (v + nb3(v, 0, 1, 0)), zero),
            jnp.where(keep, 0.5 * (wz + nb3(wz, 1, 0, 0)), zero),
        ],
        axis=1,
    )


def _gather3(src, zi, yi, xi):
    b, d, h, w = src.shape
    flat = src.reshape(b, d * h * w)
    idx = ((zi * h + yi) * w + xi).reshape(b, d * h * w)
    return jnp.take_along_axis(flat, idx, axis=1).reshape(b, d, h, w)


def interpol3(src, pos):
    """Trilinear sample; pos (b, 3, d, h, w) with channels (x, y, z) in the
    idx+0.5 convention (3-D twin of grid.interpol)."""
    _, d, h, w = src.shape
    p = pos - 0.5
    p0 = jnp.trunc(p).astype(I32)
    s1 = jnp.clip(p[:, 0] - p0[:, 0].astype(F32), 0, 1)
    t1 = jnp.clip(p[:, 1] - p0[:, 1].astype(F32), 0, 1)
    f1 = jnp.clip(p[:, 2] - p0[:, 2].astype(F32), 0, 1)
    s0, t0, f0 = 1 - s1, 1 - t1, 1 - f1
    x0 = jnp.clip(p0[:, 0], 0, w - 2)
    y0 = jnp.clip(p0[:, 1], 0, h - 2)
    z0 = jnp.clip(p0[:, 2], 0, d - 2)

    def at(zi, yi, xi):
        return _gather3(src, zi, yi, xi)

    out = (
        ((at(z0, y0, x0) * t0 + at(z0, y0 + 1, x0) * t1) * s0
         + (at(z0, y0, x0 + 1) * t0 + at(z0, y0 + 1, x0 + 1) * t1) * s1) * f0
        + ((at(z0 + 1, y0, x0) * t0 + at(z0 + 1, y0 + 1, x0) * t1) * s0
           + (at(z0 + 1, y0, x0 + 1) * t0
              + at(z0 + 1, y0 + 1, x0 + 1) * t1) * s1) * f1
    )
    return out


def _centers3(b, d, h, w):
    zz = jnp.broadcast_to(
        jnp.arange(d, dtype=F32)[None, :, None, None], (b, d, h, w)
    )
    yy = jnp.broadcast_to(
        jnp.arange(h, dtype=F32)[None, None, :, None], (b, d, h, w)
    )
    xx = jnp.broadcast_to(
        jnp.arange(w, dtype=F32)[None, None, None, :], (b, d, h, w)
    )
    return jnp.stack([xx + 0.5, yy + 0.5, zz + 0.5], axis=1)


def advect_scalar3(dt, src, U, flags, maccormack_strength=0.75,
                   method="maccormackFluidNet", impl="gather",
                   max_disp=2, line_trace=False,
                   line_trace_impl="march"):
    """Semi-Lagrangian MacCormack scalar advection, 3-D: back-trace
    (optionally an obstacle-aware ray march, like the 2-D reference path)
    + trilinear sampling + 3^3-neighbourhood clamp.

    ``impl='window'`` replaces every gather with bounded-window masked-shift
    sums (ops/window3.py), the TPU fast path; exact while per-axis
    displacements stay <= ``max_disp``.
    """
    b, d, h, w = src.shape
    fluid = flags == FLUID
    border = border_mask3(d, h, w, 1)
    start = _centers3(b, d, h, w)
    cc = jnp.where(border[None, None], 0.0, get_centered3(U))

    window = impl == "window"
    if window:
        from .window3 import (
            clamp_bounds_scalar_window3,
            interpol_window3,
            make_blocked_lookup_window3,
        )
    blocked_lookup = None
    if line_trace and window:
        blocked_lookup = make_blocked_lookup_window3(flags, max_disp)

    def trace(sdt):
        if not line_trace:
            return start - sdt * cc
        if window and line_trace_impl == "firsthit":
            from .line_trace3 import line_trace_firsthit3

            disp = jnp.clip(-sdt * cc, -max_disp, max_disp)
            return line_trace_firsthit3(start, disp, flags, max_disp)
        from .line_trace3 import calc_line_trace3

        return calc_line_trace3(
            start, -sdt * cc, flags, blocked_lookup=blocked_lookup
        )

    def sl(field, back):
        if window:
            val = interpol_window3(field, back, max_disp)
        else:
            val = interpol3(field, back)
        return jnp.where(fluid, val, field)

    fwd_back = trace(dt)
    fwd = jnp.where(border, 0.0, sl(src, fwd_back))
    if method == "eulerFluidNet":
        return fwd
    bwd = jnp.where(border, 0.0, sl(fwd, trace(-dt)))
    dst = jnp.where(fluid, fwd + maccormack_strength * 0.5 * (src - bwd), fwd)

    # clamp to the 3^3 fluid neighbourhood of the fwd landing cell
    pos = jnp.where(fluid[:, None], fwd_back, start)
    if window:
        ok, minv, maxv = clamp_bounds_scalar_window3(
            src, pos, flags, max_disp
        )
        clamped = jnp.where(
            ok, jnp.maximum(minv, jnp.minimum(maxv, dst)), fwd
        )
        return jnp.where(border, dst, clamped)
    i0 = jnp.clip(jnp.trunc(pos[:, 0]).astype(I32), 0, w - 1)
    j0 = jnp.clip(jnp.trunc(pos[:, 1]).astype(I32), 0, h - 1)
    k0 = jnp.clip(jnp.trunc(pos[:, 2]).astype(I32), 0, d - 1)
    minv = jnp.full_like(src, jnp.inf)
    maxv = jnp.full_like(src, -jnp.inf)
    n = jnp.zeros(src.shape, I32)
    for dk in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for di in (-1, 0, 1):
                ii, jj, kk = i0 + di, j0 + dj, k0 + dk
                oob = (
                    (ii < 0) | (ii >= w) | (jj < 0) | (jj >= h)
                    | (kk < 0) | (kk >= d)
                )
                ii = jnp.where(oob, 0, ii)
                jj = jnp.where(oob, 0, jj)
                kk = jnp.where(oob, 0, kk)
                f = _gather3(flags, kk, jj, ii)
                s = _gather3(src, kk, jj, ii)
                ok = (~oob) & (f == FLUID)
                minv = jnp.where(ok, jnp.minimum(minv, s), minv)
                maxv = jnp.where(ok, jnp.maximum(maxv, s), maxv)
                n = n + ok.astype(I32)
    clamped = jnp.where(
        n >= 1, jnp.maximum(minv, jnp.minimum(maxv, dst)), fwd
    )
    return jnp.where(border, dst, clamped)


def advect_velocity3(dt, U, flags, maccormack_strength=0.75,
                     method="maccormackFluidNet", impl="gather",
                     max_disp=2, orig=None):
    """Semi-Lagrangian MacCormack advection of 3-D MAC velocity ``orig`` by
    ``U`` (orig=None advects U by itself): per-component face-velocity
    resampling + trilinear back-trace sample, correction with fluid-skip
    masks, corner clamp. A separate ``orig`` carries the viscous field like
    the 2-D step does (simulate.py:66-93).

    ``impl='window'`` uses the bounded-window engine (ops/window3.py)."""
    window = impl == "window"
    if window:
        from .window3 import clamp_component_mac_window3, interpol_window3
    if orig is None:
        orig = U
    b, _, d, h, w = U.shape
    fluid = flags == FLUID
    border = border_mask3(d, h, w, 1)
    start = _centers3(b, d, h, w)
    ring = border[None, None]

    u, v, wz = U[:, 0], U[:, 1], U[:, 2]
    # full velocity vector at each face (generalising getAtMACX/Y)
    mac = [
        jnp.where(ring, 0.0, jnp.stack([
            u,
            0.25 * (v + nb3(v, 0, 0, -1) + nb3(v, 0, 1, 0) + nb3(v, 0, 1, -1)),
            0.25 * (wz + nb3(wz, 0, 0, -1) + nb3(wz, 1, 0, 0) + nb3(wz, 1, 0, -1)),
        ], axis=1)),
        jnp.where(ring, 0.0, jnp.stack([
            0.25 * (u + nb3(u, 0, -1, 0) + nb3(u, 0, 0, 1) + nb3(u, 0, -1, 1)),
            v,
            0.25 * (wz + nb3(wz, 0, -1, 0) + nb3(wz, 1, 0, 0) + nb3(wz, 1, -1, 0)),
        ], axis=1)),
        jnp.where(ring, 0.0, jnp.stack([
            0.25 * (u + nb3(u, -1, 0, 0) + nb3(u, 0, 0, 1) + nb3(u, -1, 0, 1)),
            0.25 * (v + nb3(v, -1, 0, 0) + nb3(v, 0, 1, 0) + nb3(v, -1, 1, 0)),
            wz,
        ], axis=1)),
    ]

    def sl(field, sdt):
        comps = []
        for c in range(3):
            back = start - sdt * mac[c]
            if window:
                comps.append(interpol_window3(field[:, c], back, max_disp))
            else:
                comps.append(interpol3(field[:, c], back))
        val = jnp.stack(comps, axis=1)
        return jnp.where(fluid[:, None], val, field)

    fwd = jnp.where(ring, 0.0, sl(orig, dt))
    if method == "eulerFluidNet":
        return fwd
    bwd = jnp.where(ring, 0.0, sl(fwd, -dt))

    outs = []
    for c, (dz, dy, dx) in enumerate(_AXES):
        fm = nb3(fluid, -dz, -dy, -dx)
        zz = jnp.arange(d)[None, :, None, None]
        yy = jnp.arange(h)[None, None, :, None]
        xx = jnp.arange(w)[None, None, None, :]
        idx = {2: xx, 1: yy, 0: zz}[2 if dx else (1 if dy else 0)]
        skip = (~fluid) | ((idx > 0) & (~fm))
        dst = jnp.where(
            skip, fwd[:, c],
            fwd[:, c] + maccormack_strength * 0.5 * (orig[:, c] - bwd[:, c]),
        )
        # corner clamp around pos -/+ dt*vel_mac (8 corners x 2 positions)
        if window:
            out = clamp_component_mac_window3(
                dst, orig[:, c], mac[c] * dt, max_disp
            )
            outs.append(jnp.where(border, 0.0, out))
            continue
        minv = jnp.full_like(dst, jnp.inf)
        maxv = jnp.full_like(dst, -jnp.inf)
        pos_i = jnp.stack([xx + 0 * flags, yy + 0 * flags, zz + 0 * flags],
                          axis=1).astype(F32)
        for sign in (-1.0, 1.0):
            cp = (pos_i + sign * mac[c] * dt).astype(I32)
            i0 = jnp.clip(cp[:, 0], 0, w - 2)
            j0 = jnp.clip(cp[:, 1], 0, h - 2)
            k0 = jnp.clip(cp[:, 2], 0, d - 2)
            for dk in (0, 1):
                for dj in (0, 1):
                    for di in (0, 1):
                        s = _gather3(orig[:, c], k0 + dk, j0 + dj, i0 + di)
                        minv = jnp.minimum(minv, s)
                        maxv = jnp.maximum(maxv, s)
        out = jnp.maximum(jnp.minimum(dst, maxv), minv)
        outs.append(jnp.where(border, 0.0, out))
    return jnp.stack(outs, axis=1)


def add_viscosity3(dt, U, flags, viscosity):
    """Explicit viscous diffusion, 7-point Laplacian, interior faces
    (3-D twin of ops.source_terms.add_viscosity; the reference's 2-D op is
    pytorch/lib/fluid/viscosity.py:40-70, its 3-D path never worked)."""
    _, d, h, w = flags.shape
    fl = flags == FLUID

    def lap(c):
        acc = -6.0 * c
        for s in ((0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0),
                  (-1, 0, 0), (1, 0, 0)):
            acc = acc + nb3(c, *s)
        return acc

    interior = ~border_mask3(d, h, w, 1)
    outs = []
    for c, (dz, dy, dx) in enumerate(_AXES):
        mask = fl & nb3(fl, -dz, -dy, -dx)
        comp = jnp.where(mask, U[:, c] + dt * viscosity * lap(U[:, c]), 0.0)
        outs.append(jnp.where(interior, comp, U[:, c]))
    return jnp.stack(outs, axis=1)


def correct_scalar3(dt, src, div, flags):
    """Variable-density correction, 3-D twin of ops.correct_scalar
    (Guermond-Salgado; ref: pytorch/lib/fluid/cpp/advection.py:9-12)."""
    return jnp.where(flags == FLUID, src + dt * 0.5 * src * div, src)


def curl3(U):
    """Cell-centred vorticity vector (central differences of the raw MAC
    face components — the same convention as grid.curl2d, so a z-invariant
    planar flow gives omega = (0, 0, curl2d); zero border). Diagnostic +
    vorticity confinement."""
    _, _, d, h, w = U.shape
    cu, cv, cw = U[:, 0], U[:, 1], U[:, 2]

    def ddx(a):
        return 0.5 * (nb3(a, 0, 0, 1) - nb3(a, 0, 0, -1))

    def ddy(a):
        return 0.5 * (nb3(a, 0, 1, 0) - nb3(a, 0, -1, 0))

    def ddz(a):
        return 0.5 * (nb3(a, 1, 0, 0) - nb3(a, -1, 0, 0))

    keep = ~border_mask3(d, h, w, 1)
    return jnp.stack(
        [
            jnp.where(keep, ddy(cw) - ddz(cv), 0.0),
            jnp.where(keep, ddz(cu) - ddx(cw), 0.0),
            jnp.where(keep, ddx(cv) - ddy(cu), 0.0),
        ],
        axis=1,
    )


def add_vorticity_confinement3(U, flags, strength, dt):
    """Vorticity confinement, full 3-D form (Fedkiw et al.):
    f = eps * dx * (N x omega), N = grad|omega| / ||grad|omega|||.
    The original FluidNet's own 3-D op is
    solver_cpp/src/fluidnet_implementation/tfluids.cpp:1298; this is the
    vectorised twin, applied on interior fluid faces like the 2-D version."""
    _, d, h, w = flags.shape
    fl = flags == FLUID

    om = curl3(U)
    mag = jnp.sqrt(jnp.sum(om * om, axis=1))
    gx = 0.5 * (nb3(mag, 0, 0, 1) - nb3(mag, 0, 0, -1))
    gy = 0.5 * (nb3(mag, 0, 1, 0) - nb3(mag, 0, -1, 0))
    gz = 0.5 * (nb3(mag, 1, 0, 0) - nb3(mag, -1, 0, 0))
    norm = jnp.sqrt(gx * gx + gy * gy + gz * gz) + 1e-12
    nx_, ny_, nz_ = gx / norm, gy / norm, gz / norm
    # N x omega at cell centres
    fx = ny_ * om[:, 2] - nz_ * om[:, 1]
    fy = nz_ * om[:, 0] - nx_ * om[:, 2]
    fz = nx_ * om[:, 1] - ny_ * om[:, 0]
    forces = [fx, fy, fz]

    cont = fl & (~border_mask3(d, h, w, 1))
    outs = []
    for c, (dz, dy, dx) in enumerate(_AXES):
        f_face = 0.5 * (forces[c] + nb3(forces[c], -dz, -dy, -dx))
        mask = cont & nb3(fl, -dz, -dy, -dx)
        outs.append(jnp.where(mask, U[:, c] + strength * dt * f_face,
                              U[:, c]))
    return jnp.stack(outs, axis=1)
