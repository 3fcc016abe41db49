"""VMEM-resident 3-D Jacobi pressure solver (Pallas TPU kernel).

3-D twin of jacobi_pallas.py and the post-advection bottleneck fix at 128^3:
the XLA fori_loop sweep streams p + masks + rhs through HBM every iteration;
this kernel holds everything on-chip for the entire solve — one HBM round
trip in, one out.

Semantics match ``ops.ops3d.solve_jacobi_fixed3`` (6-neighbour sweep with
obstacle-Neumann centre substitution, border/obstacle pinning, optional
weighted-Jacobi damping; reference iteration:
pytorch/lib/fluid/cpp/fluids_init.cpp:858-994), verified against it in
tests/test_pallas.py.

Design notes (TPU-first, not a translation):
* The volume is viewed as a 2-D array ``(d*h, w)`` — z-major rows, x lanes.
  All six neighbour reads become concat-shifts: x+-1 = lane shift, y+-1 =
  row shift by 1, z+-1 = row shift by h. Wrap-around rows land only in
  y/z-border cells, which the solver pins to zero anyway (standard Manta
  domains carry an OBSTACLE border ring), so no masking of the wrap is
  needed — the same trick the XLA path plays with circular ``jnp.roll``.
* The 6 obstacle-neighbour select masks are folded into ONE integer-valued
  field ``cnt`` (number of obstacle neighbours): because p == 0 on obstacle
  cells (pinned every sweep), ``sum_n [ob_n ? p_c : p_n]`` equals
  ``cnt * p_c + sum_n shift(p)_n`` exactly. That cuts VMEM residency from
  9 fields to 4 (p, cont, cnt, rhs) so a full 128^3 solve fits on-chip.
  Exactness requires p == 0 on obstacle cells, so the host wrapper masks a
  user-supplied warm start once (identical results: the XLA sweep never
  reads an obstacle cell's own p).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...celltype import OBSTACLE
from ..ops3d import border_mask3, nb3

F32 = jnp.float32


def _rshift(a, rows: int):
    """a[(r + rows) mod R, :] via concat (no gathers)."""
    if rows == 0:
        return a
    return jnp.concatenate([a[rows:, :], a[:rows, :]], axis=0)


def _cshift(a, cols: int):
    if cols == 0:
        return a
    return jnp.concatenate([a[:, cols:], a[:, :cols]], axis=1)


def _jacobi3_kernel(cont_ref, cnt_ref, div_ref, p0_ref, p_ref, *,
                    iters: int, h: int, damping: float):
    cont = cont_ref[:]
    cnt = cnt_ref[:]
    div = div_ref[:]
    w_ = damping

    def sweep(_, p):
        acc = div + cnt * p
        acc = acc + _cshift(p, -1) + _cshift(p, 1)
        acc = acc + _rshift(p, -1) + _rshift(p, 1)
        acc = acc + _rshift(p, -h) + _rshift(p, h)
        upd = acc * (1.0 / 6.0)
        if w_ != 1.0:
            upd = (1.0 - w_) * p + w_ * upd
        return cont * upd

    p_ref[:] = jax.lax.fori_loop(0, iters, sweep, p0_ref[:])


def solve_jacobi3_pallas(flags, div, iters: int, p0=None,
                         damping: float = 1.0):
    """Fixed-iteration 6-neighbour Jacobi, entirely VMEM-resident.
    flags (b, d, h, w) int32, div (b, d, h, w) f32. A non-zero ``p0``
    warm-starts the solve (the learned-projection polish path); ``damping``
    < 1 gives the weighted-Jacobi smoother (see ops.jacobi)."""
    b, d, h, w = div.shape
    ob = flags == OBSTACLE
    cont = ((~border_mask3(d, h, w, 1)[None]) & (~ob)).astype(F32)
    nbs = [(0, 0, -1), (0, 0, 1), (0, -1, 0), (0, 1, 0),
           (-1, 0, 0), (1, 0, 0)]
    cnt = sum(nb3(ob, *s).astype(F32) for s in nbs)

    if p0 is None:
        p0 = jnp.zeros_like(div)
    else:
        # Pin obstacle cells so the cnt*p_c identity is exact (the XLA sweep
        # never reads an obstacle cell's own pressure; see module docstring).
        p0 = jnp.where(ob, 0.0, p0)

    flat = lambda a: a.reshape(b, d * h, w)
    args = (flat(cont), flat(cnt), flat(div), flat(p0))

    kernel = partial(_jacobi3_kernel, iters=iters, h=h,
                     damping=float(damping))
    block = lambda: pl.BlockSpec((1, d * h, w), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[block() for _ in range(4)],
        out_specs=block(),
    )

    def kernel_b(cont_r, cnt_r, div_r, p0_r, p_r):
        kernel(cont_r.at[0], cnt_r.at[0], div_r.at[0], p0_r.at[0],
               p_r.at[0])

    out = pl.pallas_call(
        kernel_b,
        out_shape=jax.ShapeDtypeStruct((b, d * h, w), F32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=14 * iters * b * d * h * w,
            bytes_accessed=5 * b * d * h * w * 4,
            transcendentals=0,
        ),
    )(*args)
    return out.reshape(b, d, h, w)


def vmem_fits3(d: int, h: int, w: int,
               budget_bytes: int = 100 * 1024 * 1024) -> bool:
    """Whole-volume feasibility: ~6 live f32 fields (p, cont, cnt, rhs +
    shift/accumulator temps) must fit VMEM. 128^3 -> 48 MB: fits."""
    return 6 * d * h * w * 4 <= budget_bytes
