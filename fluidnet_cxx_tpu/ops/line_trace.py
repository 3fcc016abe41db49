"""Obstacle-aware ray march used by semi-Lagrangian scalar advection.

Mask-vectorised translation of the reference's line trace
(ref: pytorch/lib/fluid/cpp/calc_line_trace.cpp) into jnp + lax.while_loop.
The loop invariant is preserved: the returned position never lies inside
solid geometry nor outside the domain. 2-D only (the reference restricts
scalar advection to 2-D as well, ref: pytorch/lib/fluid/cpp/advection.py:58).

All positions are (b, 2, h, w) arrays in the `idx + 0.5` centre convention.
"""
import jax
import jax.numpy as jnp

from ..celltype import FLUID
from .common import F32, I32, cell_index_grid, gather2d, nb

HIT_MARGIN = 1e-5  # ref: calc_line_trace.cpp:7
EPSILON = 1e-12    # ref: calc_line_trace.cpp:8


def _is_out_of_domain(pos, h, w):
    """(ref: calc_line_trace.cpp:16-27); z test never fires in 2-D."""
    x, y = pos[:, 0], pos[:, 1]
    return (x <= 0) | (x >= w) | (y <= 0) | (y >= h)


def _is_blocked_cell(pos, flags):
    """True when pos falls in a non-fluid cell; False when out of domain
    (ref: calc_line_trace.cpp:33-64)."""
    _, h, w = flags.shape
    out = _is_out_of_domain(pos, h, w)
    ix = jnp.where(out, 0, jnp.trunc(pos[:, 0]).astype(I32))
    iy = jnp.where(out, 0, jnp.trunc(pos[:, 1]).astype(I32))
    blocked = gather2d(flags, iy, ix) != FLUID
    return blocked & (~out)


def _ray_border_intersection(pos, next_pos, h, w, m_out):
    """Step length to exit the domain walls along pos->next_pos, and the
    intersection point (ref: calc_line_trace.cpp:175-257).

    Returns (hit_mask, ipos). Only meaningful where ``m_out``.
    """
    min_step = jnp.full(pos.shape[0:1] + pos.shape[2:], jnp.inf, F32)

    def face(min_step, target_beyond, m_coord, next_c, pos_c):
        d = next_c - pos_c
        applicable = target_beyond & (jnp.abs(d) >= EPSILON) & m_out
        step = (m_coord - pos_c) / jnp.where(applicable, d, 1.0)
        return jnp.where(applicable, jnp.minimum(min_step, step), min_step)

    x, y = pos[:, 0], pos[:, 1]
    nx_, ny_ = next_pos[:, 0], next_pos[:, 1]
    min_step = face(min_step, nx_ <= HIT_MARGIN, HIT_MARGIN, nx_, x)
    min_step = face(min_step, ny_ <= HIT_MARGIN, HIT_MARGIN, ny_, y)
    min_step = face(min_step, nx_ >= w - HIT_MARGIN, w - HIT_MARGIN, nx_, x)
    min_step = face(min_step, ny_ >= h - HIT_MARGIN, h - HIT_MARGIN, ny_, y)

    hit = (min_step >= 0) & jnp.isfinite(min_step)
    step = jnp.where(hit, min_step, 0.0)[:, None]
    ipos = step * (next_pos - pos) + pos
    return hit, ipos


def _ray_box_intersection(origin, direction, ctr, mask):
    """Slab test of the unit box centred at ``ctr`` (expanded by HIT_MARGIN)
    against the ray from ``origin`` along ``direction``
    (ref: calc_line_trace.cpp:73-164).

    Returns (hit, coord). When the origin already lies inside the expanded
    box the reference returns the origin itself (the subsequent unconditional
    coord recomputation there corrupts that unreachable case; we implement the
    intent).
    """
    box_min = ctr - 0.5 - HIT_MARGIN
    box_max = ctr + 0.5 + HIT_MARGIN
    err_tol = 1e-6

    below = origin < box_min
    above = origin > box_max
    outside_dim = below | above
    inside = ~(outside_dim[:, 0] | outside_dim[:, 1])

    candidate = jnp.where(below, box_min, jnp.where(above, box_max, 0.0))
    dir_ok = jnp.abs(direction) > 0
    maxT = jnp.where(
        outside_dim & dir_ok,
        (candidate - origin) / jnp.where(dir_ok, direction, 1.0),
        -1.0,
    )

    which = jnp.argmax(maxT, axis=1)  # (b, h, w)
    final = jnp.max(maxT, axis=1)
    hit = inside | (final >= 0)

    coord = origin + final[:, None] * direction
    coord = jnp.stack(
        [
            jnp.where(which == 0, candidate[:, 0], coord[:, 0]),
            jnp.where(which == 1, candidate[:, 1], coord[:, 1]),
        ],
        axis=1,
    )
    # Reject when an off-plane coordinate escapes the box.
    oob = (coord < box_min - err_tol) | (coord > box_max + err_tol)
    bad = ((which != 0) & oob[:, 0]) | ((which != 1) & oob[:, 1])
    hit = hit & (~bad) & mask
    coord = jnp.where(inside[:, None] & mask[:, None], origin, coord)
    return hit, coord


_INF = 3e38  # f32-representable infinity for slab tests


def firsthit_axis_slabs(p0, d, lo, hi):
    """Per-axis slab entry/exit parameters of a ray p0 + t*d against
    [lo, hi]. Shared by every first-hit trace (2-D/3-D, XLA window and
    Pallas tile forms) — a change here changes them all in lockstep."""
    INF = jnp.float32(_INF)
    ok = jnp.abs(d) > EPSILON
    inv = 1.0 / jnp.where(ok, d, 1.0)
    t1 = (lo - p0) * inv
    t2 = (hi - p0) * inv
    inside = (p0 >= lo) & (p0 <= hi)
    t_lo = jnp.where(ok, jnp.minimum(t1, t2),
                     jnp.where(inside, -INF, INF))
    t_hi = jnp.where(ok, jnp.maximum(t1, t2),
                     jnp.where(inside, INF, -INF))
    return t_lo, t_hi


def firsthit_border_t(p0, d, dim):
    """First non-negative t at which the coordinate reaches the domain's
    HIT_MARGIN / dim-HIT_MARGIN planes moving outward
    (ref: calc_line_trace.cpp:175-257). Shared like firsthit_axis_slabs."""
    INF = jnp.float32(_INF)
    ok = jnp.abs(d) > EPSILON
    inv = 1.0 / jnp.where(ok, d, 1.0)
    t1 = (HIT_MARGIN - p0) * inv
    t2 = (dim - HIT_MARGIN - p0) * inv
    t1 = jnp.where(ok & (t1 >= 0), t1, INF)
    t2 = jnp.where(ok & (t2 >= 0), t2, INF)
    return jnp.minimum(t1, t2)


def line_trace_firsthit(pos, delta, flags, D: int = 4):
    """Continuous first-hit line trace, bounded-window form (TPU fast path).

    Branch-free reformulation of the reference's iterative ray march
    (ref: calc_line_trace.cpp:259-424) for CFL-bounded displacements: the
    stopping point of a ray from a cell centre is the FIRST intersection of
    the continuous segment [pos, pos+delta] with (a) any blocked cell's
    HIT_MARGIN-expanded box inside the (2D+1)^2 window or (b) the domain's
    margin planes — computed as a min over per-offset slab tests instead of
    a sequential march, so it runs as one fused window pass (and inside the
    Pallas advection kernel, where a data-dependent march is impractical).

    Semantics vs the reference march: identical stopping geometry (same
    expanded-box intersection the march's backoff converges to), except the
    march samples the ray at unit steps and can step OVER a blocked cell
    clipped near a corner; the continuous formulation never tunnels. The
    measured field-level difference on the canonical scenes is quantified in
    tests/test_advection.py. Positions whose own cell is non-fluid, and
    zero-length rays, return ``pos`` unchanged (the march's m_cont gate).
    """
    b, h, w = flags.shape
    xx, yy = cell_index_grid(b, h, w)
    px0, py0 = pos[:, 0], pos[:, 1]
    dx, dy = delta[:, 0], delta[:, 1]
    length = jnp.sqrt(dx * dx + dy * dy)
    can = (length > EPSILON) & (flags == FLUID)
    inv_len = 1.0 / jnp.maximum(length, EPSILON)
    dirx, diry = dx * inv_len, dy * inv_len

    axis_slabs = firsthit_axis_slabs
    border_t = firsthit_border_t

    t_stop = jnp.minimum(border_t(px0, dirx, w), border_t(py0, diry, h))
    t_stop = jnp.minimum(t_stop, length)

    blockedf = (flags != FLUID).astype(F32)
    for oy in range(-D, D + 1):
        for ox in range(-D, D + 1):
            if ox == 0 and oy == 0:
                continue  # own cell is fluid wherever the trace runs
            bl = nb(blockedf, oy, ox) > 0.5
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
    traced = jnp.stack([px0 + t_stop * dirx, py0 + t_stop * diry], axis=1)
    return jnp.where(can[:, None], traced, pos)


def calc_line_trace(pos, delta, flags, do_line_trace: bool = True,
                    blocked_lookup=None):
    """March from ``pos`` along ``delta``, stopping at walls and obstacles.

    Faithful port of calcLineTrace (ref: calc_line_trace.cpp:259-424):
    unit steps along the normalised direction; on domain exit, back off to
    the border intersection; on entering a blocked cell, back off to the cell
    box intersection (up to 4 refinement spins). With ``do_line_trace=False``
    this is simply ``pos + delta`` (the velocity-advection path,
    ref: fluids_init.cpp:691).

    ``blocked_lookup`` optionally replaces the gather-based point lookup
    (e.g. the bounded-window version from ops/window.py, the TPU fast path).
    """
    if not do_line_trace:
        return pos + delta

    if blocked_lookup is None:
        blocked_lookup = lambda q: _is_blocked_cell(q, flags)

    _, h, w = flags.shape
    m_cont = jnp.ones(pos.shape[0:1] + pos.shape[2:], bool)
    m_cont &= ~_is_out_of_domain(pos, h, w)
    m_cont &= ~blocked_lookup(pos)

    length = jnp.sqrt(jnp.sum(delta * delta, axis=1))
    m_cont &= length > EPSILON
    direction = jnp.where(
        m_cont[:, None], delta / jnp.maximum(length, EPSILON)[:, None], 0.0
    )

    # cur_step is 1 until the final partial step, so the trip count is
    # bounded by floor(max length) + a couple of backoff/termination iters.
    max_iters = jnp.floor(jnp.max(length)).astype(I32) + 3

    def scatter(dst, mask, src):
        return jnp.where(mask[:, None], src, dst)

    def cond(state):
        new_pos, cur_length, m_cont, it = state
        return jnp.any(m_cont) & (it < max_iters)

    def body(state):
        new_pos, cur_length, m_cont, it = state
        m_cont &= ~((cur_length >= length - HIT_MARGIN) & m_cont)

        cur_step = jnp.minimum(length - cur_length, 1.0)
        next_pos = jnp.where(
            m_cont[:, None], new_pos + direction * cur_step[:, None], new_pos
        )

        # Case 1: next_pos exits the grid (ref: calc_line_trace.cpp:324-361).
        m_out = _is_out_of_domain(next_pos, h, w) & m_cont
        hit_b, ipos = _ray_border_intersection(pos, next_pos, h, w, m_out)
        # Rare no-hit fallback: clamp inside the domain
        # (ref: calc_line_trace.cpp:334-341; the reference's clampToDomain is
        # a non-inplace no-op — we apply the intended clamp).
        no_hit = (~hit_b) & m_out
        clamped = jnp.stack(
            [
                jnp.clip(next_pos[:, 0], HIT_MARGIN, w - HIT_MARGIN),
                jnp.clip(next_pos[:, 1], HIT_MARGIN, h - HIT_MARGIN),
            ],
            axis=1,
        )
        ipos = scatter(ipos, no_hit, clamped)

        ipos_blocked = blocked_lookup(ipos)
        blocked_i = ipos_blocked & m_out
        against_border = (~ipos_blocked) & m_out
        new_pos = scatter(new_pos, against_border, ipos)
        m_cont &= ~against_border
        next_pos = scatter(next_pos, blocked_i & m_cont, ipos)

        # Case 2: next_pos entered a blocked cell
        # (ref: calc_line_trace.cpp:362-410).
        m_block = blocked_lookup(next_pos) & m_cont

        def backoff(carry, _):
            next_pos, m_cont, count_mask = carry
            count_mask &= blocked_lookup(next_pos)
            ctr = jnp.trunc(next_pos).astype(F32) + 0.5
            hit, coord = _ray_box_intersection(
                new_pos, direction, ctr, count_mask
            )
            dead = (~hit) & count_mask
            m_cont &= ~dead
            count_mask &= hit
            next_pos = scatter(next_pos, hit & count_mask, coord)
            return (next_pos, m_cont, count_mask), None

        (next_pos, m_cont, _), _ = jax.lax.scan(
            backoff, (next_pos, m_cont, m_block), None, length=4
        )

        # Blocked rays stop at the backed-off point.
        new_pos = scatter(new_pos, m_block & m_cont, next_pos)
        m_cont &= ~m_block

        # Everyone else advances.
        new_pos = scatter(new_pos, m_cont, next_pos)
        cur_length = jnp.where(m_cont, cur_length + cur_step, cur_length)
        m_cont &= ~(cur_length >= length - HIT_MARGIN)
        return new_pos, cur_length, m_cont, it + 1

    new_pos, _, _, _ = jax.lax.while_loop(
        cond, body, (pos, jnp.zeros_like(length), m_cont, jnp.array(0, I32))
    )
    return new_pos
