"""Fully-fused multigrid V-cycle (Pallas TPU kernel).

The entire pressure solve — every level's smoothing sweeps, residual,
border fold, restriction, Neumann extension, prolongation, and the coarse
solve — runs in ONE pallas_call with every level's state resident in VMEM.
A 512^2 solve touches HBM once in and once out; the per-op dispatch
overhead that dominates the XLA V-cycle (~30-45 us per op on v5e) vanishes.

TPU-first design choices:
* Neighbour reads are concat-shifts (VPU select/merge passes), like
  jacobi_pallas.py; the obstacle-substitution sum uses the cnt-identity
  (sum_n sel_n = cnt * p_c + sum_n shift(p)_n, exact while p == 0 on
  obstacle cells — see jacobi3_pallas.py).
* Grid transfers run on the MXU: restriction is R_y @ r @ R_x^T with banded
  0/1 child-sum matrices, prolongation is P_y @ e @ P_x^T with the
  cell-centered bilinear (3/4, 1/4) bands — a (256x512)@(512x512) matmul is
  ~1 us on v5e vs the lane-dim reshuffles a reshape-based restriction would
  cost in Mosaic.
* The level hierarchy is unrolled statically (Python recursion at trace
  time), so XLA sees one straight-line kernel.

Semantics match ops.multigrid.solve_mg (same smoother, fold, compatibility
projection, extension, transfers) — verified against it in
tests/test_pallas.py. Inference-only (no autodiff rule).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...celltype import OBSTACLE
from ..common import border_mask, nb
from .. import multigrid as mgx

F32 = jnp.float32


def _shift(a, dy: int, dx: int):
    """a[y+dy, x+dx] (circular) via concat — no gathers."""
    if dy:
        a = jnp.concatenate([a[dy:, :], a[:dy, :]], axis=0)
    if dx:
        a = jnp.concatenate([a[:, dx:], a[:, :dx]], axis=1)
    return a


def _iotas(h, w):
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return yy, xx


def _restrict_matrix(n_f: int) -> np.ndarray:
    """(n_f/2, n_f) child-sum band: R[i, 2i] = R[i, 2i+1] = 1."""
    R = np.zeros((n_f // 2, n_f), np.float32)
    idx = np.arange(n_f // 2)
    R[idx, 2 * idx] = 1.0
    R[idx, 2 * idx + 1] = 1.0
    return R


def _prolong_matrix(n_f: int) -> np.ndarray:
    """(n_f, n_f/2) cell-centered bilinear band, clamped at the ends
    (the wrapped entries of the roll-based XLA prolongation only land in
    dead border cells, so clamping is identical after cont-masking)."""
    n_c = n_f // 2
    P = np.zeros((n_f, n_c), np.float32)
    for i in range(n_c):
        for a in (0, 1):
            r = 2 * i + a
            j = min(i + 1, n_c - 1) if a else max(i - 1, 0)
            P[r, i] += 0.75
            P[r, j] += 0.25
    return P


def _sweeps(p, rhs, cont, cnt, n: int, damping: float):
    w_ = damping

    def body(_, p):
        acc = rhs + cnt * p
        acc = acc + _shift(p, 0, -1) + _shift(p, 0, 1)
        acc = acc + _shift(p, -1, 0) + _shift(p, 1, 0)
        upd = acc * 0.25
        if w_ != 1.0:
            upd = (1.0 - w_) * p + w_ * upd
        return cont * upd

    return jax.lax.fori_loop(0, n, body, p)


def _residual(p, rhs, cont, cnt):
    acc = _shift(p, 0, -1) + _shift(p, 0, 1)
    acc = acc + _shift(p, -1, 0) + _shift(p, 1, 0)
    return cont * (rhs - 4.0 * p + acc + cnt * p)


def _fold_border(r, h, w):
    yy, xx = _iotas(h, w)
    r = (r + jnp.where(yy == 2, _shift(r, -1, 0), 0.0)
         + jnp.where(yy == h - 3, _shift(r, 1, 0), 0.0))
    r = jnp.where((yy == 1) | (yy == h - 2), 0.0, r)
    r = (r + jnp.where(xx == 2, _shift(r, 0, -1), 0.0)
         + jnp.where(xx == w - 3, _shift(r, 0, 1), 0.0))
    return jnp.where((xx == 1) | (xx == w - 2), 0.0, r)


def _project(rhs, cont):
    mean = jnp.sum(rhs * cont) / jnp.maximum(jnp.sum(cont), 1.0)
    return (rhs - mean) * cont


def _extend(e, cont):
    live = cont
    e = e * live
    for _ in range(2):
        num = jnp.zeros_like(e)
        den = jnp.zeros_like(e)
        for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0)):
            num = num + _shift(e * live, dy, dx)
            den = den + _shift(live, dy, dx)
        fill = num / jnp.maximum(den, 1.0)
        e = jnp.where(live > 0.5, e, fill)
        live = jnp.maximum(live, (den > 0.5).astype(F32))
    return e


def _mm(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=F32
    )


def _mm_t(a, b):
    """a @ b.T without materialising the transpose (MXU handles the
    contraction side natively; an explicit .T would be a Mosaic relayout)."""
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=F32
    )


def _vcycle_k(p, rhs, lvl, conts, cnts, mats, pre, post, coarse, damping):
    cont, cnt = conts[lvl], cnts[lvl]
    rhs = _project(rhs, cont)
    if lvl + 1 == len(conts):
        return _sweeps(p, rhs, cont, cnt, coarse, damping)
    p = _sweeps(p, rhs, cont, cnt, pre, damping)
    h, w = p.shape
    r = _fold_border(_residual(p, rhs, cont, cnt), h, w)
    Ry, Rx, Py, Px = mats[lvl]
    rhs_c = _mm(Ry, _mm_t(r, Rx))
    e_c = jnp.zeros_like(rhs_c)
    e_c = _vcycle_k(e_c, rhs_c, lvl + 1, conts, cnts, mats, pre, post,
                    coarse, damping)
    e_c = _extend(e_c, conts[lvl + 1])
    p = p + cont * _mm(Py, _mm_t(e_c, Px))
    return _sweeps(p, rhs, cont, cnt, post, damping)


def _mg_kernel(*refs, n_lvls, n_vcycles, pre, post, coarse, damping):
    # refs layout: [cont_0..], [cnt_0..], rhs, p0, [Ry,Rx,Py,Px per lvl],
    # out
    conts = [refs[i][0] for i in range(n_lvls)]
    cnts = [refs[n_lvls + i][0] for i in range(n_lvls)]
    rhs = refs[2 * n_lvls][0]
    p = refs[2 * n_lvls + 1][0]
    mats = []
    base = 2 * n_lvls + 2
    for i in range(n_lvls - 1):
        mats.append(tuple(refs[base + 4 * i + j][:] for j in range(4)))
    out_ref = refs[base + 4 * (n_lvls - 1)]

    for _ in range(n_vcycles):
        p = _vcycle_k(p, rhs, 0, conts, cnts, mats, pre, post, coarse,
                      damping)
    out_ref[0] = p


def solve_mg_pallas(flags, div, n_vcycles: int = 2, pre: int = 4,
                    post: int = 4, coarse_iters: int = 32,
                    damping: float = 2.0 / 3.0, min_size: int = 8,
                    p0=None):
    """== ops.multigrid.solve_mg, fused into one VMEM-resident kernel.
    flags (b, h, w) int32, div (b, h, w) f32."""
    b, h, w = div.shape
    lvl_flags = mgx._levels(flags, min_size)
    n_lvls = len(lvl_flags)

    conts, cnts = [], []
    for lf in lvl_flags:
        _, lh, lw = lf.shape
        ob = lf == OBSTACLE
        conts.append(((~(border_mask(lh, lw, 1)[None] | ob))
                      .astype(F32)))
        cnts.append(sum(nb(ob, dy, dx).astype(F32)
                        for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0))))

    if p0 is None:
        p0 = jnp.zeros_like(div)
    else:
        p0 = jnp.where(lvl_flags[0] == OBSTACLE, 0.0, p0)

    mats = []
    for lf in lvl_flags[:-1]:
        _, lh, lw = lf.shape
        mats.extend([
            jnp.asarray(_restrict_matrix(lh)),
            jnp.asarray(_restrict_matrix(lw)),
            jnp.asarray(_prolong_matrix(lh)),
            jnp.asarray(_prolong_matrix(lw)),
        ])

    args = conts + cnts + [div, p0] + mats

    def bspec(a):
        if a.ndim == 3:  # batched field: one sample per grid step
            return pl.BlockSpec((1,) + a.shape[1:], lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(
        _mg_kernel, n_lvls=n_lvls, n_vcycles=n_vcycles, pre=pre, post=post,
        coarse=coarse_iters, damping=float(damping),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), F32),
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[bspec(a) for a in args],
            out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_vcycles * (pre + post + 8) * 1.4 * 10 * b * h * w),
            bytes_accessed=int(6 * b * h * w * 4),
            transcendentals=0,
        ),
    )(*args)
    return out


def mg_vmem_fits(h: int, w: int,
                 budget_bytes: int = 80 * 1024 * 1024) -> bool:
    """~6 live f32 fields on the fine level + 1/3 for coarser levels."""
    return int(8 * h * w * 4 * 4 / 3) <= budget_bytes
