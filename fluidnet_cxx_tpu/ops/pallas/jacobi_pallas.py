"""VMEM-resident Jacobi pressure solver (Pallas TPU kernel).

The XLA fori_loop version streams p through HBM every sweep (~9 us/sweep at
512^2 on v5e). This kernel holds p, the RHS and the obstacle masks in VMEM
for the entire iteration and only touches HBM once in and once out, making
the sweep VPU-bound. One grid program per batch sample; each sample's grid
must fit VMEM (f32 grids up to ~1024^2).

Semantics identical to ops.jacobi.solve_jacobi_fixed (border/obstacle
pinning, obstacle-Neumann substitution) — verified against it in tests.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...celltype import OBSTACLE


def _shift(a, dy: int, dx: int):
    """a[(y+dy) mod h, (x+dx) mod w] without gathers (roll via concat)."""
    if dy:
        a = jnp.concatenate([a[dy:, :], a[:dy, :]], axis=0)
    if dx:
        a = jnp.concatenate([a[:, dx:], a[:, :dx]], axis=1)
    return a


def _jacobi_kernel(flags_ref, div_ref, p_ref, iters: int, p0_ref=None,
                   damping: float = 1.0):
    # Direct ``ref[0]`` loads — a ``.at[0]`` ref view is a memref_slice
    # Mosaic cannot form at non-128-multiple widths (this was the old
    # 'layout mismatch at non-square shapes'). flags arrive as f32 (cell
    # types are tiny integers, exact in f32).
    h, w = div_ref.shape[1:]
    flags = flags_ref[0]
    div = div_ref[0]

    obf = jnp.where(flags == float(OBSTACLE), 1.0, 0.0)  # f32 mask: Mosaic
    ob = obf > 0.5                                # dislikes i1 shifts
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (xx < 1) | (xx > w - 2) | (yy < 1) | (yy > h - 2)
    cont = ~(border | ob)

    ob_xm = _shift(obf, 0, -1) > 0.5
    ob_xp = _shift(obf, 0, 1) > 0.5
    ob_ym = _shift(obf, -1, 0) > 0.5
    ob_yp = _shift(obf, 1, 0) > 0.5

    def sweep(_, p):
        p1 = jnp.where(ob_xm, p, _shift(p, 0, -1))
        p2 = jnp.where(ob_xp, p, _shift(p, 0, 1))
        p3 = jnp.where(ob_ym, p, _shift(p, -1, 0))
        p4 = jnp.where(ob_yp, p, _shift(p, 1, 0))
        upd = (p1 + p2 + p3 + p4 + div) * 0.25
        if damping != 1.0:
            upd = (1.0 - damping) * p + damping * upd
        return jnp.where(cont, upd, 0.0)

    init = (jnp.zeros((h, w), jnp.float32) if p0_ref is None
            else p0_ref[0])
    p_ref[0] = jax.lax.fori_loop(0, iters, sweep, init)


def solve_jacobi_pallas(flags, div, iters: int, p0=None,
                        damping: float = 1.0):
    """Fixed-iteration Jacobi, one VMEM-resident Pallas program per batch
    sample. Inputs: flags (b, h, w) int32, div (b, h, w) f32. A non-zero
    ``p0`` warm-starts the solve (the learned-projection polish path);
    ``damping`` < 1 gives the weighted-Jacobi smoother (see ops.jacobi)."""
    b, h, w = div.shape
    kernel = partial(_jacobi_kernel, iters=iters, damping=damping)
    block = lambda: pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    n_in = 2 if p0 is None else 3
    grid_spec = pl.GridSpec(
        grid=(b,),
        in_specs=[block() for _ in range(n_in)],
        out_specs=block(),
    )

    if p0 is None:
        def kernel3(flags_ref, div_ref, p_ref):
            kernel(flags_ref, div_ref, p_ref)
        args = (flags.astype(jnp.float32), div)
    else:
        def kernel3(flags_ref, div_ref, p0_ref, p_ref):
            kernel(flags_ref, div_ref, p_ref, p0_ref=p0_ref)
        args = (flags.astype(jnp.float32), div, p0)

    return pl.pallas_call(
        kernel3,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=10 * iters * b * h * w,
            bytes_accessed=(3 + (p0 is not None)) * b * h * w * 4,
            transcendentals=0,
        ),
    )(*args)


def vmem_fits(h: int, w: int, budget_bytes: int = 12 * 1024 * 1024) -> bool:
    """Rough VMEM feasibility: ~6 live f32/bool grids."""
    return 6 * h * w * 4 <= budget_bytes
