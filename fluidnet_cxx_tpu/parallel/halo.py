"""Spatial domain decomposition with explicit halo exchange (shard_map).

The stencil analogue of sequence parallelism: the grid's x axis is sharded
over the mesh's ``sx`` axis and each Jacobi sweep exchanges one boundary
column with its ring neighbours via ``lax.ppermute`` (ICI traffic only,
no full-grid gathers). This is the scalable pressure solver for very wide
domains (the reference's 8000x800 cylinder is the motivating workload).

The plain ``ops.jacobi`` version remains the single-chip default; XLA's
auto-sharding (GSPMD) also handles sharded inputs correctly, but this
explicit version pins the communication pattern to one column per sweep.
"""
from functools import partial

import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..celltype import OBSTACLE


def _ring_halo(a, axis_name):
    """Exchange boundary columns: returns (col from left nbr, col from right
    nbr); zeros at the global domain edges."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    right_edge = a[..., -1:]
    left_edge = a[..., :1]
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    from_left = lax.ppermute(right_edge, axis_name, fwd)
    from_right = lax.ppermute(left_edge, axis_name, bwd)
    from_left = jnp.where(idx == 0, 0.0, from_left)
    from_right = jnp.where(idx == n - 1, 0.0, from_right)
    return from_left, from_right


def solve_jacobi_sharded(
    flags, div, iters: int, mesh: Mesh, axis_name: str = "sx"
):
    """Fixed-iteration Jacobi with the x axis sharded over ``axis_name``.

    Semantics identical to ops.jacobi.solve_jacobi_fixed (border/obstacle
    pinning, obstacle-Neumann substitution); verified against it in tests.
    """
    spec = P(None, None, axis_name)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=spec,
    )
    def run(flags_l, div_l):
        b, h, wl = flags_l.shape
        n = lax.axis_size(axis_name)
        idx = lax.axis_index(axis_name)

        obstacle = flags_l == OBSTACLE
        fl_left, fl_right = _ring_halo(
            obstacle.astype(jnp.float32), axis_name
        )
        ob_left = fl_left > 0.5   # left halo column of the obstacle mask
        ob_right = fl_right > 0.5

        # Global border ring: rows 0/h-1 everywhere; col 0 only on the first
        # block, col W-1 only on the last.
        yy = jnp.arange(h)[None, :, None]
        xx = jnp.arange(wl)[None, None, :]
        border = (yy < 1) | (yy > h - 2)
        border = border | ((idx == 0) & (xx < 1))
        border = border | ((idx == n - 1) & (xx > wl - 2))
        cont = (~border) & (~obstacle)

        ob_xm = jnp.concatenate([ob_left, obstacle[..., :-1]], axis=-1)
        ob_xp = jnp.concatenate([obstacle[..., 1:], ob_right], axis=-1)
        ob_ym = jnp.concatenate(
            [obstacle[:, :1], obstacle[:, :-1]], axis=1
        )
        ob_yp = jnp.concatenate(
            [obstacle[:, 1:], obstacle[:, -1:]], axis=1
        )

        def sweep(_, p):
            p_left, p_right = _ring_halo(p, axis_name)
            p_xm = jnp.concatenate([p_left, p[..., :-1]], axis=-1)
            p_xp = jnp.concatenate([p[..., 1:], p_right], axis=-1)
            p_ym = jnp.concatenate([p[:, :1], p[:, :-1]], axis=1)
            p_yp = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
            p1 = jnp.where(ob_xm, p, p_xm)
            p2 = jnp.where(ob_xp, p, p_xp)
            p3 = jnp.where(ob_ym, p, p_ym)
            p4 = jnp.where(ob_yp, p, p_yp)
            return jnp.where(cont, (p1 + p2 + p3 + p4 + div_l) * 0.25, 0.0)

        return lax.fori_loop(0, iters, sweep, jnp.zeros_like(div_l))

    return run(flags, div)
