"""Linear stencil ops: divergence, pressure-gradient update, wall BCs.

Each op reproduces the reference's masked-tensor semantics exactly
(citations inline) but as branch-free jnp expressions that XLA fuses into a
handful of VPU passes on TPU.
"""
import jax.numpy as jnp

from ..celltype import EMPTY, FLUID, OBSTACLE, STICK
from .common import border_mask, nb


def velocity_divergence(U, flags):
    """Poisson RHS: ``rhs = -div(U)`` per fluid cell, border excluded.

    rhs(i,j) = u(i,j) - u(i+1,j) + v(i,j) - v(i,j+1); zero in obstacles and on
    the 1-ring border. NOTE the sign: this is Manta's makeRhs, i.e. MINUS the
    divergence (ref: pytorch/lib/fluid/velocity_divergence.py:58-73).
    """
    _, h, w = flags.shape
    u, v = U[:, 0], U[:, 1]
    rhs = (u - nb(u, 0, 1)) + (v - nb(v, 1, 0))
    keep = (~border_mask(h, w, 1)) & (flags != OBSTACLE)
    return jnp.where(keep, rhs, 0.0)


def velocity_update(p, U, flags):
    """Subtract the pressure gradient: U' = U - grad(p), Bridson p.44 BCs.

    Per interior face (x shown; y symmetric), with E = TypeEmpty:
      fluid(i) & fluid(i-1):  u -= p(i) - p(i-1)
      fluid(i) & E(i-1):      u -= p(i)
      E(i)     & fluid(i-1):  u += p(i-1)
      otherwise (obstacle involved / E-E): u = 0
    Border faces are left untouched.
    (ref: pytorch/lib/fluid/velocity_update.py:47-149)
    """
    _, h, w = flags.shape
    u, v = U[:, 0], U[:, 1]
    fl = flags == FLUID
    em = flags == EMPTY
    fl_xm = nb(fl, 0, -1)
    em_xm = nb(em, 0, -1)
    fl_ym = nb(fl, -1, 0)
    em_ym = nb(em, -1, 0)
    p_xm = nb(p, 0, -1)
    p_ym = nb(p, -1, 0)

    u_new = jnp.where(
        fl & fl_xm,
        u - (p - p_xm),
        jnp.where(fl & em_xm, u - p, jnp.where(em & fl_xm, u + p_xm, 0.0)),
    )
    v_new = jnp.where(
        fl & fl_ym,
        v - (p - p_ym),
        jnp.where(fl & em_ym, v - p, jnp.where(em & fl_ym, v + p_ym, 0.0)),
    )
    interior = ~border_mask(h, w, 1)
    return jnp.stack(
        [jnp.where(interior, u_new, u), jnp.where(interior, v_new, v)], axis=1
    )


def set_wall_bcs(U, flags):
    """Free-slip walls: zero the normal velocity on obstacle faces.

    Applied on fluid|obstacle cells over the WHOLE grid (index clamped at 0):
      u(i,j) = 0 if cell(i-1,j) is obstacle, or cell is obstacle with fluid
      left-neighbour; v symmetric in y.
    (ref: pytorch/lib/fluid/set_wall_bcs.py:47-78)
    """
    u, v = U[:, 0], U[:, 1]
    fl = flags == FLUID
    ob = flags == OBSTACLE
    cont = fl | ob

    # Left/down neighbour with index clamped at 0 (i_l = max(i-1, 0)).
    fl_xm = jnp.concatenate([fl[:, :, :1], fl[:, :, :-1]], axis=2)
    ob_xm = jnp.concatenate([ob[:, :, :1], ob[:, :, :-1]], axis=2)
    fl_ym = jnp.concatenate([fl[:, :1, :], fl[:, :-1, :]], axis=1)
    ob_ym = jnp.concatenate([ob[:, :1, :], ob[:, :-1, :]], axis=1)

    kill_u = cont & (ob_xm | (ob & fl_xm))
    kill_v = cont & (ob_ym | (ob & fl_ym))
    return jnp.stack(
        [jnp.where(kill_u, 0.0, u), jnp.where(kill_v, 0.0, v)], axis=1
    )


def set_wall_bcs_stick(U, flags, flags_stick):
    """No-slip (stick) walls: slip BC plus tangential ghost-cell reflection.

    The reference implementation (pytorch/lib/fluid/set_wall_bcs_stick.py)
    contains NameErrors (bare TypeObstacle etc., :62,68,73,75) and could never
    execute; this is the cleanly-implemented intent:
      1. zero all velocity inside obstacle cells,
      2. slip BC on normal components (as set_wall_bcs, index clamped at 0),
      3. in stick cells, set the tangential ghost velocity to the negated
         fluid neighbour value (mean of both sides if double-sided),
      4. corner stick cells (stick neighbours on both adjacent sides) zeroed.
    """
    _, h, w = flags.shape
    u, v = U[:, 0], U[:, 1]
    fl = flags == FLUID
    ob = flags == OBSTACLE
    st = flags_stick == STICK
    cont = fl | ob | st

    # 1. zero inside obstacles.
    u = jnp.where(ob, 0.0, u)
    v = jnp.where(ob, 0.0, v)

    # 2. slip on normals (zeroBy.where(i<=0, ...) semantics: false at i==0).
    xx = jnp.arange(w)[None, None, :]
    yy = jnp.arange(h)[None, :, None]
    ob_xm = nb(ob, 0, -1) & (xx > 0)
    fl_xm = nb(fl, 0, -1) & (xx > 0)
    ob_ym = nb(ob, -1, 0) & (yy > 0)
    fl_ym = nb(fl, -1, 0) & (yy > 0)
    u = jnp.where(cont & (ob_xm | (ob & fl_xm)), 0.0, u)
    v = jnp.where(cont & (ob_ym | (ob & fl_ym)), 0.0, v)

    # 3. tangential ghost reflection in stick cells.
    fl_xp = nb(fl, 0, 1) & (xx < w - 1)
    fl_yp = nb(fl, 1, 0) & (yy < h - 1)
    v_xm = jnp.where(xx > 0, nb(v, 0, -1), 0.0)
    v_xp = jnp.where(xx < w - 1, nb(v, 0, 1), 0.0)
    u_ym = jnp.where(yy > 0, nb(u, -1, 0), 0.0)
    u_yp = jnp.where(yy < h - 1, nb(u, 1, 0), 0.0)

    v = jnp.where(cont & st & fl_xm, -v_xm, v)
    v = jnp.where(cont & st & fl_xp, -v_xp, v)
    v = jnp.where(cont & st & fl_xm & fl_xp, -0.5 * (v_xm + v_xp), v)
    u = jnp.where(cont & st & fl_ym, -u_ym, u)
    u = jnp.where(cont & st & fl_yp, -u_yp, u)
    u = jnp.where(cont & st & fl_ym & fl_yp, -0.5 * (u_ym + u_yp), u)

    # 4. corners: stick cell whose x- and y-adjacent neighbours are stick too.
    st_xm = nb(st, 0, -1) & (xx > 0)
    st_xp = nb(st, 0, 1) & (xx < w - 1)
    st_ym = nb(st, -1, 0) & (yy > 0)
    st_yp = nb(st, 1, 0) & (yy < h - 1)
    u = jnp.where(cont & st & st_xm & (st_ym | st_yp), 0.0, u)
    v = jnp.where(cont & st & st_ym & (st_xm | st_xp), 0.0, v)

    return jnp.stack([u, v], axis=1)


def flags_to_occupancy(flags):
    """Manta flags -> {0: fluid, 1: obstacle} float CNN input channel
    (ref: pytorch/lib/fluid/flags_to_occupancy.py:6-19)."""
    occ = flags.astype(jnp.float32)
    occ = jnp.where(flags == FLUID, 0.0, occ)
    occ = jnp.where(flags == OBSTACLE, 1.0, occ)
    return occ


def empty_domain(b: int, h: int, w: int, bnd: int = 1):
    """Fresh flags grid: fluid interior, obstacle wall of width ``bnd``
    (ref: pytorch/lib/fluid/util.py:5-47)."""
    border = border_mask(h, w, bnd)
    flags = jnp.where(border, OBSTACLE, FLUID).astype(jnp.int32)
    return jnp.broadcast_to(flags[None], (b, h, w))
