"""Unconditionally-stable MacCormack semi-Lagrangian advection.

TPU-native rewrite of the reference's ATen extension
(ref: pytorch/lib/fluid/cpp/fluids_init.cpp): back-traces, fluid-aware
bilinear sampling, MacCormack correction and Selle-style forward clamping are
expressed as fused jnp gathers so the whole pipeline compiles to one XLA
computation (differentiable except through the scalar line trace).

2-D only, matching the reference (ref: pytorch/lib/fluid/cpp/advection.py:58).
"""
import jax.numpy as jnp

from ..celltype import FLUID
from .common import F32, I32, border_mask, cell_index_grid, gather2d, nb
from .grid import (
    get_at_mac_x,
    get_at_mac_y,
    get_centered,
    interpol,
    interpol_with_fluid,
)
from .line_trace import calc_line_trace

EULER = "eulerFluidNet"
MACCORMACK = "maccormackFluidNet"


def _centers(b, h, w):
    xx, yy = cell_index_grid(b, h, w)
    return jnp.stack(
        [xx.astype(F32) + 0.5, yy.astype(F32) + 0.5], axis=1
    )


def _clamp_bounds_scalar(src, pos, flags, sample_outside):
    """Min/max of ``src`` over the fluid cells in the 3x3 neighbourhood of the
    cell containing ``pos`` (ref: fluids_init.cpp:154-222).

    Returns (do_clamp, minv, maxv).
    """
    _, h, w = src.shape
    i0 = jnp.clip(jnp.trunc(pos[:, 0]).astype(I32), 0, w - 1)
    j0 = jnp.clip(jnp.trunc(pos[:, 1]).astype(I32), 0, h - 1)

    minv = jnp.full_like(src, jnp.inf)
    maxv = jnp.full_like(src, -jnp.inf)
    ncells = jnp.zeros(src.shape, I32)
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            ii, jj = i0 + di, j0 + dj
            oob = (ii < 0) | (ii >= w) | (jj < 0) | (jj >= h)
            ii = jnp.where(oob, 0, ii)
            jj = jnp.where(oob, 0, jj)
            f = gather2d(flags, jj, ii)
            s = gather2d(src, jj, ii)
            ok = (~oob) & ((f == FLUID) | sample_outside)
            minv = jnp.where(ok, jnp.minimum(minv, s), minv)
            maxv = jnp.where(ok, jnp.maximum(maxv, s), maxv)
            ncells = ncells + ok.astype(I32)
    return ncells >= 1, minv, maxv


def advect_scalar(
    dt,
    src,
    U,
    flags,
    method: str = MACCORMACK,
    bnd: int = 1,
    sample_outside_fluid: bool = False,
    maccormack_strength: float = 0.75,
    line_trace: bool = True,
    impl: str = "gather",
    max_disp: int = 4,
    line_trace_impl: str = "march",
):
    """Advect scalar ``src`` by ``U`` (ref: fluids_init.cpp:265-382).

    Returns the advected field; the output border ring (width ``bnd``) is
    zeroed, solid cells keep their source value, as in the reference.

    ``impl='window'`` uses the bounded-window sampling engine (ops/window.py)
    — the TPU fast path, exact for |dt*u| <= max_disp cells (displacements
    are clamped to the window beyond that). With ``impl='window'`` the
    obstacle trace can run as the reference's iterative march
    (``line_trace_impl='march'``) or the branch-free continuous first-hit
    formulation (``'firsthit'``, the semantics of the fused Pallas kernel —
    see line_trace.line_trace_firsthit).
    """
    from .line_trace import line_trace_firsthit
    from .window import (
        clamp_bounds_scalar_window,
        interpol_window,
        interpol_with_fluid_window,
        make_blocked_lookup_window,
    )

    b, h, w = src.shape
    fluid = flags == FLUID
    start = _centers(b, h, w)
    border = border_mask(h, w, bnd)
    window = impl == "window"
    blocked_lookup = (
        make_blocked_lookup_window(flags, max_disp) if window else None
    )

    def semi_lagrange(field, sdt):
        disp = jnp.where(
            border_mask(h, w, 1)[None, None], 0.0, -sdt * get_centered(U)
        )
        if window:
            disp = jnp.clip(disp, -max_disp, max_disp)
        if line_trace and window and line_trace_impl == "firsthit":
            back = line_trace_firsthit(start, disp, flags, max_disp)
        else:
            back = calc_line_trace(
                start, disp, flags, line_trace, blocked_lookup=blocked_lookup
            )
        if sample_outside_fluid:
            val = (
                interpol_window(field, back, max_disp)
                if window
                else interpol(field, back)
            )
        else:
            val = (
                interpol_with_fluid_window(field, flags, back, max_disp)
                if window
                else interpol_with_fluid(field, flags, back)
            )
        # Solid cells are not advected (ref: fluids_init.cpp:33-34).
        return jnp.where(fluid, val, field), back

    fwd_val, fwd_back = semi_lagrange(src, dt)
    fwd = jnp.where(border, 0.0, fwd_val)
    if method == EULER:
        return fwd

    fwd_pos = jnp.where(fluid[:, None], fwd_back, start)

    bwd_val, _ = semi_lagrange(fwd, -dt)
    bwd = jnp.where(border, 0.0, bwd_val)

    # MacCormack correction (ref: fluids_init.cpp:135-148).
    dst = jnp.where(
        fluid, fwd + maccormack_strength * 0.5 * (src - bwd), fwd
    )

    # Forward-position clamp (ref: fluids_init.cpp:224-263): clamp the
    # corrected value to the neighbourhood extrema, reverting to the Euler
    # value when no valid neighbour exists.
    if window:
        do_clamp, minv, maxv = clamp_bounds_scalar_window(
            src, fwd_pos, flags, sample_outside_fluid, max_disp
        )
    else:
        do_clamp, minv, maxv = _clamp_bounds_scalar(
            src, fwd_pos, flags, sample_outside_fluid
        )
    clamped = jnp.where(
        do_clamp, jnp.maximum(minv, jnp.minimum(maxv, dst)), fwd
    )
    return jnp.where(border, dst, clamped)


def _clamp_component_mac(c, dst_c, orig, fwd_c, vel_mac_dt, b, h, w):
    """Selle et al. clamp for one MAC component
    (ref: fluids_init.cpp:500-654): min/max over the bilinear corners of the
    integer positions pos -/+ dt*vel_mac.

    The reference's NotInBounds test can never fire after the index clamping
    it applies (i0 in [0, dim-2]), so the unclamped-fallback branch is dead
    code and omitted here.
    """
    xx, yy = cell_index_grid(b, h, w)
    pos = jnp.stack([xx.astype(F32), yy.astype(F32)], axis=1)

    minv = jnp.full((b, h, w), jnp.inf, F32)
    maxv = jnp.full((b, h, w), -jnp.inf, F32)
    for sign in (-1.0, 1.0):
        cp = (pos + sign * vel_mac_dt).astype(I32)  # trunc toward zero
        i0 = jnp.clip(cp[:, 0], 0, w - 2)
        j0 = jnp.clip(cp[:, 1], 0, h - 2)
        for dj in (0, 1):
            for di in (0, 1):
                s = gather2d(orig[:, c], j0 + dj, i0 + di)
                minv = jnp.minimum(minv, s)
                maxv = jnp.maximum(maxv, s)
    return jnp.maximum(jnp.minimum(dst_c, maxv), minv)


def advect_velocity(
    dt,
    orig,
    U,
    flags,
    method: str = MACCORMACK,
    bnd: int = 1,
    maccormack_strength: float = 0.75,
    impl: str = "gather",
    max_disp: int = 4,
):
    """Advect MAC velocity ``orig`` by ``U`` (ref: fluids_init.cpp:656-807).

    Each component is sampled at its own face position (getAtMACX/Y) with a
    straight back-trace (the reference disables the line trace for velocity,
    ref: fluids_init.cpp:691). The output border ring is zeroed.

    Note: the reference's solid-cell passthrough writes src channel 1 into
    ret channel 0 twice (fluids_init.cpp:413-416), losing channel 1; we keep
    the intended per-channel passthrough.
    """
    from .window import clamp_component_mac_window, interpol_window

    b, _, h, w = U.shape
    fluid = flags == FLUID
    start = _centers(b, h, w)
    border = border_mask(h, w, bnd)
    ring1 = border_mask(h, w, 1)[None, None]
    window = impl == "window"

    mac_x = jnp.where(ring1, 0.0, get_at_mac_x(U))
    mac_y = jnp.where(ring1, 0.0, get_at_mac_y(U))

    def sample(field_c, pos):
        if window:
            return interpol_window(field_c, pos, max_disp)
        return interpol(field_c, pos)

    def semi_lagrange_mac(field, sdt):
        vx = sample(field[:, 0], start + (-sdt) * mac_x)
        vy = sample(field[:, 1], start + (-sdt) * mac_y)
        val = jnp.stack([vx, vy], axis=1)
        return jnp.where(fluid[:, None], val, field)

    fwd = jnp.where(border[None, None], 0.0, semi_lagrange_mac(orig, dt))
    if method == EULER:
        return fwd

    bwd = jnp.where(border[None, None], 0.0, semi_lagrange_mac(fwd, -dt))

    # Correction with per-face fluid-neighbour skip masks
    # (ref: fluids_init.cpp:453-498).
    # Neighbour flags via shifts, not gathers: a gather on flags forces
    # GSPMD to all-gather the whole array under width sharding (and runs on
    # the scalar core), while a 1-cell roll lowers to a halo
    # collective-permute. The wrapped column/row is masked out by the
    # (xx > 0) / (yy > 0) guards below.
    xx, yy = cell_index_grid(b, h, w)
    fl_xm = nb(flags, 0, -1) == FLUID
    fl_ym = nb(flags, -1, 0) == FLUID
    skip_u = (~fluid) | ((xx > 0) & (~fl_xm))
    skip_v = (~fluid) | ((yy > 0) & (~fl_ym))

    def correct(c, skip):
        return jnp.where(
            skip,
            fwd[:, c],
            fwd[:, c] + maccormack_strength * 0.5 * (orig[:, c] - bwd[:, c]),
        )

    dst_u = correct(0, skip_u)
    dst_v = correct(1, skip_v)

    if window:
        clamp_u = clamp_component_mac_window(
            dst_u, orig[:, 0], mac_x * dt, max_disp
        )
        clamp_v = clamp_component_mac_window(
            dst_v, orig[:, 1], mac_y * dt, max_disp
        )
    else:
        clamp_u = _clamp_component_mac(
            0, dst_u, orig, fwd[:, 0], mac_x * dt, b, h, w
        )
        clamp_v = _clamp_component_mac(
            1, dst_v, orig, fwd[:, 1], mac_y * dt, b, h, w
        )

    out_u = jnp.where(border, 0.0, clamp_u)
    out_v = jnp.where(border, 0.0, clamp_v)
    return jnp.stack([out_u, out_v], axis=1)
