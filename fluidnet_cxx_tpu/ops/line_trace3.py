"""Obstacle-aware ray march in 3-D (twin of ops/line_trace.py).

The reference's 3-D line-trace code exists but is part of its declared-buggy
3-D path (ref: pytorch/lib/fluid/cpp/calc_line_trace.cpp with zDim > 1,
README.md:31); this is the clean 3-axis generalisation of the (tested) 2-D
semantics: unit-step march, border back-off, cell-box back-off with 4
refinement spins, loop invariant "never inside solid / outside domain".

Positions are (b, 3, d, h, w) arrays, channels (x, y, z), `idx + 0.5`
centre convention.
"""
import jax
import jax.numpy as jnp

from ..celltype import FLUID
from .common import F32, I32
from .line_trace import (
    EPSILON,
    HIT_MARGIN,
    firsthit_axis_slabs,
    firsthit_border_t,
)


def _is_out_of_domain3(pos, d, h, w):
    x, y, z = pos[:, 0], pos[:, 1], pos[:, 2]
    return (x <= 0) | (x >= w) | (y <= 0) | (y >= h) | (z <= 0) | (z >= d)


def _gather_point3(field, pos):
    b, d, h, w = field.shape
    ix = jnp.trunc(pos[:, 0]).astype(I32)
    iy = jnp.trunc(pos[:, 1]).astype(I32)
    iz = jnp.trunc(pos[:, 2]).astype(I32)
    flat = field.reshape(b, d * h * w)
    idx = ((iz * h + iy) * w + ix).reshape(b, d * h * w)
    return jnp.take_along_axis(flat, idx, axis=1).reshape(b, d, h, w)


def _is_blocked_cell3(pos, flags):
    _, d, h, w = flags.shape
    out = _is_out_of_domain3(pos, d, h, w)
    safe = jnp.where(out[:, None], 0.5, pos)
    blocked = _gather_point3(flags, safe) != FLUID
    return blocked & (~out)


def _ray_border_intersection3(pos, next_pos, d, h, w, m_out):
    """Step length to exit the domain walls along pos->next_pos and the
    intersection point (3-D twin of line_trace._ray_border_intersection)."""
    min_step = jnp.full(pos.shape[0:1] + pos.shape[2:], jnp.inf, F32)

    def face(min_step, target_beyond, m_coord, next_c, pos_c):
        delta = next_c - pos_c
        applicable = target_beyond & (jnp.abs(delta) >= EPSILON) & m_out
        step = (m_coord - pos_c) / jnp.where(applicable, delta, 1.0)
        return jnp.where(applicable, jnp.minimum(min_step, step), min_step)

    for c, dim in ((0, w), (1, h), (2, d)):
        pc, nc = pos[:, c], next_pos[:, c]
        min_step = face(min_step, nc <= HIT_MARGIN, HIT_MARGIN, nc, pc)
        min_step = face(
            min_step, nc >= dim - HIT_MARGIN, dim - HIT_MARGIN, nc, pc
        )

    hit = (min_step >= 0) & jnp.isfinite(min_step)
    step = jnp.where(hit, min_step, 0.0)[:, None]
    ipos = step * (next_pos - pos) + pos
    return hit, ipos


def _ray_box_intersection3(origin, direction, ctr, mask):
    """Slab test of the unit cube centred at ``ctr`` (expanded by HIT_MARGIN)
    against the ray from ``origin`` along ``direction``."""
    box_min = ctr - 0.5 - HIT_MARGIN
    box_max = ctr + 0.5 + HIT_MARGIN
    err_tol = 1e-6

    below = origin < box_min
    above = origin > box_max
    outside_dim = below | above
    inside = ~(outside_dim[:, 0] | outside_dim[:, 1] | outside_dim[:, 2])

    candidate = jnp.where(below, box_min, jnp.where(above, box_max, 0.0))
    dir_ok = jnp.abs(direction) > 0
    maxT = jnp.where(
        outside_dim & dir_ok,
        (candidate - origin) / jnp.where(dir_ok, direction, 1.0),
        -1.0,
    )

    which = jnp.argmax(maxT, axis=1)
    final = jnp.max(maxT, axis=1)
    hit = inside | (final >= 0)

    coord = origin + final[:, None] * direction
    coord = jnp.stack(
        [jnp.where(which == c, candidate[:, c], coord[:, c])
         for c in range(3)],
        axis=1,
    )
    oob = (coord < box_min - err_tol) | (coord > box_max + err_tol)
    bad = (
        ((which != 0) & oob[:, 0])
        | ((which != 1) & oob[:, 1])
        | ((which != 2) & oob[:, 2])
    )
    hit = hit & (~bad) & mask
    coord = jnp.where(inside[:, None] & mask[:, None], origin, coord)
    return hit, coord


def calc_line_trace3(pos, delta, flags, do_line_trace: bool = True,
                     blocked_lookup=None):
    """March from ``pos`` along ``delta`` in 3-D, stopping at walls and
    obstacles. Same contract as the 2-D calc_line_trace."""
    if not do_line_trace:
        return pos + delta

    if blocked_lookup is None:
        blocked_lookup = lambda q: _is_blocked_cell3(q, flags)

    _, d, h, w = flags.shape
    m_cont = jnp.ones(pos.shape[0:1] + pos.shape[2:], bool)
    m_cont &= ~_is_out_of_domain3(pos, d, h, w)
    m_cont &= ~blocked_lookup(pos)

    length = jnp.sqrt(jnp.sum(delta * delta, axis=1))
    m_cont &= length > EPSILON
    direction = jnp.where(
        m_cont[:, None], delta / jnp.maximum(length, EPSILON)[:, None], 0.0
    )

    max_iters = jnp.floor(jnp.max(length)).astype(I32) + 3

    def scatter(dst, mask, src):
        return jnp.where(mask[:, None], src, dst)

    def cond(state):
        _, _, m_cont, it = state
        return jnp.any(m_cont) & (it < max_iters)

    def body(state):
        new_pos, cur_length, m_cont, it = state
        m_cont &= ~((cur_length >= length - HIT_MARGIN) & m_cont)

        cur_step = jnp.minimum(length - cur_length, 1.0)
        next_pos = jnp.where(
            m_cont[:, None], new_pos + direction * cur_step[:, None], new_pos
        )

        # Case 1: next_pos exits the grid.
        m_out = _is_out_of_domain3(next_pos, d, h, w) & m_cont
        hit_b, ipos = _ray_border_intersection3(pos, next_pos, d, h, w, m_out)
        no_hit = (~hit_b) & m_out
        clamped = jnp.stack(
            [
                jnp.clip(next_pos[:, 0], HIT_MARGIN, w - HIT_MARGIN),
                jnp.clip(next_pos[:, 1], HIT_MARGIN, h - HIT_MARGIN),
                jnp.clip(next_pos[:, 2], HIT_MARGIN, d - HIT_MARGIN),
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

        # Case 2: next_pos entered a blocked cell.
        m_block = blocked_lookup(next_pos) & m_cont

        def backoff(carry, _):
            next_pos, m_cont, count_mask = carry
            count_mask &= blocked_lookup(next_pos)
            ctr = jnp.trunc(next_pos).astype(F32) + 0.5
            hit, coord = _ray_box_intersection3(
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

        new_pos = scatter(new_pos, m_block & m_cont, next_pos)
        m_cont &= ~m_block

        new_pos = scatter(new_pos, m_cont, next_pos)
        cur_length = jnp.where(m_cont, cur_length + cur_step, cur_length)
        m_cont &= ~(cur_length >= length - HIT_MARGIN)
        return new_pos, cur_length, m_cont, it + 1

    new_pos, _, _, _ = jax.lax.while_loop(
        cond, body, (pos, jnp.zeros_like(length), m_cont, jnp.array(0, I32))
    )
    return new_pos


def line_trace_firsthit3(pos, delta, flags, D: int = 2):
    """Continuous first-hit line trace, 3-D bounded-window form.

    3-axis twin of line_trace.line_trace_firsthit (see its docstring): the
    stopping point is the first intersection of [pos, pos+delta] with a
    blocked cell's HIT_MARGIN-expanded box inside the (2D+1)^3 window or
    with the domain's margin planes, as a min over per-offset slab tests.
    Never tunnels through corner-clipped cells (unlike the unit-step
    march); ~97% of traces identical to the march at extreme obstacle
    densities, every difference a strictly earlier stop (2-D measurement,
    tests/test_advection.py; the 3-D formulation is axis-identical).
    """
    from .ops3d import nb3
    from .window3 import _index_grids3

    b, d, h, w = flags.shape
    zz, yy, xx = _index_grids3(b, d, h, w)
    px0, py0, pz0 = pos[:, 0], pos[:, 1], pos[:, 2]
    dx, dy, dz = delta[:, 0], delta[:, 1], delta[:, 2]
    length = jnp.sqrt(dx * dx + dy * dy + dz * dz)
    can = (length > EPSILON) & (flags == FLUID)
    inv_len = 1.0 / jnp.maximum(length, EPSILON)
    dirx, diry, dirz = dx * inv_len, dy * inv_len, dz * inv_len
    axis_slabs = firsthit_axis_slabs
    border_t = firsthit_border_t

    t_stop = jnp.minimum(
        jnp.minimum(border_t(px0, dirx, w), border_t(py0, diry, h)),
        border_t(pz0, dirz, d),
    )
    t_stop = jnp.minimum(t_stop, length)

    blockedf = (flags != FLUID).astype(F32)
    for oz in range(-D, D + 1):
        for oy in range(-D, D + 1):
            for ox in range(-D, D + 1):
                if ox == 0 and oy == 0 and oz == 0:
                    continue
                bl = nb3(blockedf, oz, oy, ox) > 0.5
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
    traced = jnp.stack(
        [px0 + t_stop * dirx, py0 + t_stop * diry, pz0 + t_stop * dirz],
        axis=1,
    )
    return jnp.where(can[:, None], traced, pos)
