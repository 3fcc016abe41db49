"""Minimal 3-D simulation step.

Composes the 3-D kernels (ops/ops3d.py) in the same operation order as the
2-D ``simulate_step``. The reference has no working 3-D path (README.md:31);
this covers the core loop — MacCormack advection, buoyancy/gravity, wall
BCs, Jacobi projection. Not yet in 3-D: line trace, stick BCs, periodic
overrides, learned projection.
"""
from typing import NamedTuple

import jax.numpy as jnp

from ..config import SimConfig
from ..ops import ops3d


class SimState3(NamedTuple):
    p: jnp.ndarray        # (b, d, h, w)
    U: jnp.ndarray        # (b, 3, d, h, w)
    flags: jnp.ndarray    # (b, d, h, w) int32
    density: jnp.ndarray  # (b, d, h, w)


def create_state3(b: int, d: int, h: int, w: int) -> SimState3:
    return SimState3(
        p=jnp.zeros((b, d, h, w), jnp.float32),
        U=jnp.zeros((b, 3, d, h, w), jnp.float32),
        flags=ops3d.empty_domain3(b, d, h, w),
        density=jnp.zeros((b, d, h, w), jnp.float32),
    )


def simulate_step3(cfg: SimConfig, state: SimState3) -> SimState3:
    flags = state.flags
    U, rho = state.U, state.density
    dt = cfg.dt

    if cfg.advect_density:
        rho = ops3d.advect_scalar3(
            dt, rho, U, flags,
            maccormack_strength=cfg.maccormack_strength,
            method=cfg.advection_method,
        )
    U = ops3d.advect_velocity3(
        dt, U, flags,
        maccormack_strength=cfg.maccormack_strength,
        method=cfg.advection_method,
    )

    gvec = jnp.asarray(cfg.gravity_vec, jnp.float32)
    if cfg.buoyancy_scale > 0:
        U = ops3d.add_buoyancy3(
            U, flags, rho, gvec * (-cfg.buoyancy_scale),
            cfg.operating_density, dt,
        )
    if cfg.gravity_scale > 0:
        U = ops3d.add_gravity3(U, flags, gvec * (-cfg.gravity_scale), dt)

    U = ops3d.set_wall_bcs3(U, flags)
    div = ops3d.velocity_divergence3(U, flags)
    p = ops3d.solve_jacobi_fixed3(flags, div, cfg.jacobi_iter)
    U = ops3d.velocity_update3(p, U, flags)
    U = ops3d.set_wall_bcs3(U, flags)
    return SimState3(p=p, U=U, flags=flags, density=rho)
