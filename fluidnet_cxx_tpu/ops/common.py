"""Shared array helpers for the 2-D MAC-grid kernels.

Array layout convention (TPU-native, differs from the reference's 5-D
``(b, c, d, h, w)`` torch layout):

* scalar fields (p, rho, div, flags): ``(b, h, w)``
* MAC velocity: ``(b, 2, h, w)`` — channel 0 is u (x-faces), channel 1 is v
  (y-faces)
* positions: ``(b, 2, h, w)`` — channel 0 is x, channel 1 is y, in the Manta
  convention where cell centers sit at ``idx + 0.5``
  (ref: pytorch/lib/fluid/cpp/grid.cpp:27-28)

``w`` (x) is the innermost/lane axis, ``h`` (y) the sublane axis, which is the
layout XLA:TPU tiles best for 128-multiple grids.
"""
import jax.numpy as jnp

F32 = jnp.float32
I32 = jnp.int32


def nb(a, dy: int, dx: int):
    """Neighbour view: result[..., y, x] = a[..., y+dy, x+dx].

    Uses a circular roll; all kernels mask the border ring afterwards, matching
    the reference which never reads across the 1-cell boundary wall.
    """
    if dy == 0 and dx == 0:
        return a
    return jnp.roll(a, shift=(-dy, -dx), axis=(-2, -1))


def border_mask(h: int, w: int, bnd: int = 1):
    """Boolean (h, w) mask, True on the ``bnd``-wide border ring.

    Mirrors the maskBorder construction used everywhere in the reference
    (e.g. pytorch/lib/fluid/cpp/fluids_init.cpp:313-321).
    """
    yy = jnp.arange(h, dtype=I32)[:, None]
    xx = jnp.arange(w, dtype=I32)[None, :]
    return (xx < bnd) | (xx > w - 1 - bnd) | (yy < bnd) | (yy > h - 1 - bnd)


def interior_mask(h: int, w: int, bnd: int = 1):
    return ~border_mask(h, w, bnd)


def gather2d(src, yi, xi):
    """Batched 2-D gather: out[b, y, x] = src[b, yi[b,y,x], xi[b,y,x]].

    Indices must already be within bounds. Lowers to a single XLA gather over
    the flattened (h*w) axis, which Mosaic/XLA handles natively on TPU.
    """
    b, h, w = src.shape
    flat = src.reshape(b, h * w)
    idx = (yi * w + xi).reshape(b, h * w)
    return jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w)


def cell_index_grid(b: int, h: int, w: int):
    """Integer (x, y) index grids, each (b, h, w)."""
    xx = jnp.broadcast_to(jnp.arange(w, dtype=I32)[None, None, :], (b, h, w))
    yy = jnp.broadcast_to(jnp.arange(h, dtype=I32)[None, :, None], (b, h, w))
    return xx, yy
