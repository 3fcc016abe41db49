"""Jacobi pressure Poisson solver.

Iteration semantics follow the reference exactly
(ref: pytorch/lib/fluid/cpp/fluids_init.cpp:809-1004): pressure is pinned to
zero on the 1-ring border and in obstacle cells; obstacle neighbours are
substituted by the centre value (homogeneous Neumann); fluid AND empty cells
update as ``p = (p_W + p_E + p_S + p_N + rhs) / 4``; the residual is
``max_b ||p - p_prev||_2``.

Two drivers are provided:
* ``solve_jacobi_fixed`` — fixed iteration count via ``lax.fori_loop``; the
  shipped configs use ``pTol = 0`` (ref: pytorch/plumeConfig.yaml:62) so this
  is the default, fully differentiable path.
* ``solve_jacobi`` — early-exit ``lax.while_loop`` honouring ``p_tol``, for
  parity with the reference API.

A VMEM-resident Pallas fast path lives in ``pallas/jacobi_pallas.py`` and is
dispatched automatically for grids that fit on-chip.
"""
import jax
import jax.numpy as jnp

from ..celltype import OBSTACLE
from .common import F32, border_mask, nb


def _sweep_maker(flags, div, damping: float = 1.0):
    _, h, w = flags.shape
    obstacle = flags == OBSTACLE
    dead = border_mask(h, w, 1)[None] | obstacle
    cont = ~dead
    ob_xm = nb(obstacle, 0, -1)
    ob_xp = nb(obstacle, 0, 1)
    ob_ym = nb(obstacle, -1, 0)
    ob_yp = nb(obstacle, 1, 0)
    w_ = float(damping)

    def sweep(p):
        p1 = jnp.where(ob_xm, p, nb(p, 0, -1))
        p2 = jnp.where(ob_xp, p, nb(p, 0, 1))
        p3 = jnp.where(ob_ym, p, nb(p, -1, 0))
        p4 = jnp.where(ob_yp, p, nb(p, 1, 0))
        upd = (p1 + p2 + p3 + p4 + div) * 0.25
        if w_ != 1.0:
            upd = (1.0 - w_) * p + w_ * upd
        return jnp.where(cont, upd, 0.0)

    return sweep


def _residual(p_new, p_old):
    d = (p_new - p_old).reshape(p_new.shape[0], -1)
    return jnp.max(jnp.sqrt(jnp.sum(d * d, axis=1)))


def solve_jacobi_fixed(flags, div, iters: int, with_residual: bool = False,
                       p0=None, damping: float = 1.0):
    """Run exactly ``iters`` Jacobi sweeps from ``p0`` (default 0).
    Differentiable. A non-zero ``p0`` warm-starts the solve — used to polish
    a CNN-predicted pressure with a few cheap sweeps.

    ``damping`` < 1 gives weighted Jacobi ``p <- (1-w) p + w sweep(p)``.
    Plain Jacobi (w=1, the reference iteration) does NOT damp near-Nyquist
    error modes (its iteration-matrix eigenvalue is -1 at the checkerboard
    and ~-1 for 2-cell stripes) — fine when starting from p0=0 whose error
    is smooth, useless as a smoother for a CNN warm start whose error has
    patch-seam stripes. w=2/3 is the classical multigrid smoother choice:
    every mode with wavelength <= 4 cells damps by >= 1/3 per sweep."""
    sweep = _sweep_maker(flags, div, damping)
    if p0 is None:
        p0 = jnp.zeros_like(div)

    if not with_residual:
        p = jax.lax.fori_loop(0, iters, lambda _, p: sweep(p), p0)
        return p

    def body(_, carry):
        p, _ = carry
        p_new = sweep(p)
        return p_new, _residual(p_new, p)

    p, res = jax.lax.fori_loop(0, iters, body, (p0, jnp.array(jnp.inf, F32)))
    return p, res


def solve_jacobi(flags, div, p_tol: float = 1e-5, max_iter: int = 1000):
    """Reference-parity solver: early exit when the residual drops below
    ``p_tol``. Returns (p, residual). Uses a fixed-trip fori_loop when
    p_tol == 0 (the shipped default) so it stays scan- and vjp-friendly."""
    if p_tol <= 0.0:
        return solve_jacobi_fixed(flags, div, max_iter, with_residual=True)

    sweep = _sweep_maker(flags, div)
    p0 = jnp.zeros_like(div)

    def cond(state):
        _, res, it = state
        return (it < max_iter) & (res >= p_tol)

    def body(state):
        p, _, it = state
        p_new = sweep(p)
        return p_new, _residual(p_new, p), it + 1

    p, res, _ = jax.lax.while_loop(
        cond, body, (p0, jnp.array(jnp.inf, F32), jnp.array(0, jnp.int32))
    )
    return p, res
