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
    # Gauge fix: the pure-Neumann system is singular (constants are null
    # vectors), and a warm start carries/accumulates a null component that
    # cold-started Jacobi never develops — it leaks into velocity at
    # fluid|empty faces and compounds across closed-loop steps (measured
    # blow-up at 1 V-cycle/step warm). Pin the same zero-mean gauge the
    # cold-started solvers produce.
    cont0 = conts[0]
    p = cont0 * (p - jnp.sum(p * cont0) / jnp.maximum(jnp.sum(cont0), 1.0))
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


# ------------------------------------------------- fused MG projection

def _mg_proj_kernel(*refs, n_lvls, n_vcycles, pre, post, coarse, damping):
    """V-cycle solve PLUS the projection tail (divergence RHS in, velocity
    update + free-slip wall BCs out) — the whole pressure projection in one
    VMEM-resident program. refs: [cont_0..], [cnt_0..], flags, u, v, p0,
    [Ry,Rx,Py,Px per lvl], p_out, u_out, v_out."""
    from ...celltype import EMPTY, FLUID

    conts = [refs[i][0] for i in range(n_lvls)]
    cnts = [refs[n_lvls + i][0] for i in range(n_lvls)]
    flags = refs[2 * n_lvls][0]  # f32 (see proj_tail_pallas: i32 blocks
    u = refs[2 * n_lvls + 1][0]  # have lane-tiling Mosaic can't slice
    v = refs[2 * n_lvls + 2][0]  # unaligned)
    p = refs[2 * n_lvls + 3][0]
    mats = []
    base = 2 * n_lvls + 4
    for i in range(n_lvls - 1):
        mats.append(tuple(refs[base + 4 * i + j][:] for j in range(4)))
    p_out_ref, u_out_ref, v_out_ref = refs[base + 4 * (n_lvls - 1):]

    h, w = u.shape
    flf = jnp.where(flags == float(FLUID), 1.0, 0.0)
    obf = jnp.where(flags == float(OBSTACLE), 1.0, 0.0)
    emf = jnp.where(flags == float(EMPTY), 1.0, 0.0)
    fl, ob, em = flf > 0.5, obf > 0.5, emf > 0.5
    yy, xx = _iotas(h, w)
    border = (xx < 1) | (xx > w - 2) | (yy < 1) | (yy > h - 2)
    interior = ~border

    # RHS (minus divergence, Manta makeRhs; == ops.stencils.velocity_divergence)
    rhs = (u - _shift(u, 0, 1)) + (v - _shift(v, 1, 0))
    rhs = jnp.where(interior & (~ob), rhs, 0.0)

    for _ in range(n_vcycles):
        p = _vcycle_k(p, rhs, 0, conts, cnts, mats, pre, post, coarse,
                      damping)
    # Gauge fix (see _mg_kernel): zero-mean over continuation cells.
    cont0 = conts[0]
    p = cont0 * (p - jnp.sum(p * cont0) / jnp.maximum(jnp.sum(cont0), 1.0))

    # velocity update (Bridson BCs, ops.stencils.velocity_update)
    fl_xm = _shift(flf, 0, -1) > 0.5
    em_xm = _shift(emf, 0, -1) > 0.5
    fl_ym = _shift(flf, -1, 0) > 0.5
    em_ym = _shift(emf, -1, 0) > 0.5
    p_xm = _shift(p, 0, -1)
    p_ym = _shift(p, -1, 0)
    u_new = jnp.where(
        fl & fl_xm, u - (p - p_xm),
        jnp.where(fl & em_xm, u - p, jnp.where(em & fl_xm, u + p_xm, 0.0)),
    )
    v_new = jnp.where(
        fl & fl_ym, v - (p - p_ym),
        jnp.where(fl & em_ym, v - p, jnp.where(em & fl_ym, v + p_ym, 0.0)),
    )
    u_new = jnp.where(interior, u_new, u)
    v_new = jnp.where(interior, v_new, v)

    # free-slip wall BCs (index clamped at 0, ops.stencils.set_wall_bcs)
    def clampm(a, axis):
        # circular shift + first-row/col fix-up: 1-wide slices force
        # Mosaic layouts that cannot be sliced at non-128-multiple widths
        if axis == 1:
            return jnp.where(xx == 0, a, _shift(a, 0, -1))
        return jnp.where(yy == 0, a, _shift(a, -1, 0))

    contw = fl | ob
    kill_u = contw & ((clampm(obf, 1) > 0.5) | (ob & (clampm(flf, 1) > 0.5)))
    kill_v = contw & ((clampm(obf, 0) > 0.5) | (ob & (clampm(flf, 0) > 0.5)))

    p_out_ref[0] = p
    u_out_ref[0] = jnp.where(kill_u, 0.0, u_new)
    v_out_ref[0] = jnp.where(kill_v, 0.0, v_new)


def project_mg_pallas(flags, U, p0=None, n_vcycles: int = 1, pre: int = 4,
                      post: int = 4, coarse_iters: int = 32,
                      damping: float = 2.0 / 3.0, min_size: int = 8,
                      interpret: bool = False):
    """The ENTIRE pressure projection in one pallas_call: divergence RHS,
    ``n_vcycles`` V-cycles warm-started from ``p0`` (e.g. the CNN head
    output — the learned solve replaces all but the last V-cycle), the
    pressure-gradient velocity update and free-slip wall BCs.
    == the chain velocity_divergence -> solve_mg(p0) -> velocity_update ->
    set_wall_bcs (tests/test_pallas.py)."""
    b, h, w = flags.shape
    lvl_flags = mgx._levels(flags, min_size)
    n_lvls = len(lvl_flags)

    conts, cnts = [], []
    for lf in lvl_flags:
        _, lh, lw = lf.shape
        ob = lf == OBSTACLE
        conts.append(((~(border_mask(lh, lw, 1)[None] | ob)).astype(F32)))
        cnts.append(sum(nb(ob, dy, dx).astype(F32)
                        for dy, dx in ((0, -1), (0, 1), (-1, 0), (1, 0))))

    if p0 is None:
        p0 = jnp.zeros((b, h, w), F32)
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

    args = conts + cnts + [flags.astype(F32), U[:, 0], U[:, 1], p0] + mats

    def bspec(a):
        if a.ndim == 3:
            return pl.BlockSpec((1,) + a.shape[1:], lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec(a.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = partial(
        _mg_proj_kernel, n_lvls=n_lvls, n_vcycles=n_vcycles, pre=pre,
        post=post, coarse=coarse_iters, damping=float(damping),
    )
    p, u_o, v_o = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((b, h, w), F32)] * 3,
        grid_spec=pl.GridSpec(
            grid=(b,),
            in_specs=[bspec(a) for a in args],
            out_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                    memory_space=pltpu.VMEM)] * 3,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(n_vcycles * (pre + post + 8) * 1.4 * 10 * b * h * w
                      + 40 * b * h * w),
            bytes_accessed=int(8 * b * h * w * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    return p, jnp.stack([u_o, v_o], axis=1)
