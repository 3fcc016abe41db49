"""Canonical scene setups: buoyant plume, Rayleigh-Taylor, cylinder, box.

Functional equivalents of the reference's in-place BC builders
(ref: pytorch/lib/fluid/init_conditions.py, geometry_utils.py,
cylinder.py:40-101): each returns a fresh SimState carrying the constant-BC
masks that ``apply_const_vals`` re-imposes every step.
"""
import math

import jax.numpy as jnp
import numpy as np

from ..celltype import OBSTACLE, STICK
from ..config import SimConfig
from ..state import SimState, create_state


def create_plume_scene(
    res_x: int,
    res_y: int,
    density_val: float = 1.0,
    u_scale: float = 1.0,
    rad: float = 0.2,
    batch: int = 1,
) -> SimState:
    """Bottom-wall inlet disc blowing upward (ref: init_conditions.py:4-86).

    The inlet occupies rows 0..3; inside the disc U=(0, u_scale) and
    density=density_val are pinned; outside the disc (in those rows) the
    velocity is pinned to zero and density is left alone.
    """
    state = create_state(batch, res_y, res_x)
    center_x = res_x // 2
    plume_rad = math.floor(res_x * rad)

    xx = np.arange(res_x)
    inside_cols = (xx - center_x) ** 2 <= plume_rad * plume_rad  # (w,)
    rows = np.zeros(res_y, bool)
    rows[0:4] = True
    inside = rows[:, None] & inside_cols[None, :]      # (h, w) inlet disc
    in_rows = rows[:, None] & np.ones(res_x, bool)     # (h, w) rows 0..3

    U_bc = np.zeros((batch, 2, res_y, res_x), np.float32)
    U_bc[:, 1][:, inside] = u_scale
    # Velocity is pinned everywhere in the inlet rows (zero outside the disc).
    U_bc_inv = np.ones((batch, 2, res_y, res_x), np.float32)
    U_bc_inv[:, :, in_rows] = 0.0

    rho_bc = np.zeros((batch, res_y, res_x), np.float32)
    rho_bc[:, inside] = density_val
    rho_bc_inv = np.ones((batch, res_y, res_x), np.float32)
    rho_bc_inv[:, inside] = 0.0

    return state._replace(
        U_bc=jnp.asarray(U_bc),
        U_bc_inv_mask=jnp.asarray(U_bc_inv),
        density_bc=jnp.asarray(rho_bc),
        density_bc_inv_mask=jnp.asarray(rho_bc_inv),
    )


def create_rayleigh_taylor_scene(
    res_x: int,
    res_y: int,
    rho1: float = -0.01,
    rho2: float = 0.01,
    perturb_thickness: float = 100.0,
    perturb_amplitude: float = 0.01,
    height: float = 0.5,
    batch: int = 1,
) -> SimState:
    """tanh density interface with a cosine perturbation
    (ref: init_conditions.py:88-130)."""
    state = create_state(batch, res_y, res_x)
    X = np.arange(res_x, dtype=np.float32)[None, :]
    Y = np.arange(res_y, dtype=np.float32)[:, None]
    density = 0.5 * (
        rho2 + rho1
        + (rho2 - rho1)
        * np.tanh(
            perturb_thickness
            * (
                Y / res_y
                - (
                    height
                    + perturb_amplitude * np.cos(2 * math.pi * X / res_x)
                )
            )
        )
    ).astype(np.float32)
    density = np.broadcast_to(density[None], (batch, res_y, res_x))
    return state._replace(density=jnp.asarray(density))


def add_cylinder(flags, center_x: float, center_y: float, radius: float):
    """Rasterise a solid disc into the flags grid
    (ref: geometry_utils.py:4-35)."""
    _, h, w = flags.shape
    X = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    Y = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    mask = (X - center_x) ** 2 + (Y - center_y) ** 2 <= radius * radius
    return jnp.where(mask, OBSTACLE, flags).astype(jnp.int32)


def add_box2d(flags, x0: int, x1: int, y0: int, y1: int):
    """Rasterise a solid axis-aligned box (ref: geometry_utils.py:37-63;
    the reference's y-mask is degenerate (Y>=y1 && Y<y1) — we implement the
    obvious intent)."""
    _, h, w = flags.shape
    X = jnp.arange(w)[None, None, :]
    Y = jnp.arange(h)[None, :, None]
    mask = (X >= x0) & (X < x1) & (Y >= y0) & (Y < y1)
    return jnp.where(mask, OBSTACLE, flags).astype(jnp.int32)


def create_cylinder_scene(
    res_x: int = 8000,
    res_y: int = 800,
    center_x: float = 500.0,
    center_y: float = None,
    radius: float = 80.5,
    inlet_vel: float = 1.0,
    reynolds: float = 100.0,
    batch: int = 1,
):
    """Flow past a cylinder with no-slip (stick) obstacle and a left-wall
    inlet (ref: pytorch/cylinder.py:40-101,163-209).

    Returns (state, viscosity) where viscosity = |u|·D/Re.
    """
    if center_y is None:
        center_y = res_y // 2
    state = create_state(batch, res_y, res_x)
    X = jnp.arange(res_x, dtype=jnp.float32)[None, None, :]
    Y = jnp.arange(res_y, dtype=jnp.float32)[None, :, None]
    cyl = (X - center_x) ** 2 + (Y - center_y) ** 2 <= radius * radius
    flags = jnp.where(cyl, OBSTACLE, state.flags).astype(jnp.int32)
    # Only the cylinder cells are no-slip; the domain walls stay free-slip
    # (ref: cylinder.py:77: flags_stick marks just the rasterised disc).
    flags_stick = jnp.where(cyl, STICK, flags).astype(jnp.int32)

    X = np.arange(res_x)[None, :]
    Y = np.arange(res_y)[:, None]
    inlet = (X < 3) & (Y > 0) & (Y < res_y - 1)  # (h, w)

    U_bc = np.zeros((batch, 2, res_y, res_x), np.float32)
    U_bc[:, 0][:, inlet] = inlet_vel
    U_bc_inv = np.ones((batch, 2, res_y, res_x), np.float32)
    U_bc_inv[:, :, inlet] = 0.0

    # Initial condition: uniform inlet velocity everywhere.
    U0 = np.zeros((batch, 2, res_y, res_x), np.float32)
    U0[:, 0] = inlet_vel

    viscosity = float(abs(inlet_vel) * radius * 2.0 / reynolds)
    state = state._replace(
        U=jnp.asarray(U0),
        flags=flags,
        flags_stick=flags_stick,
        U_bc=jnp.asarray(U_bc),
        U_bc_inv_mask=jnp.asarray(U_bc_inv),
    )
    return state, viscosity


def plume_config(**overrides) -> SimConfig:
    """Defaults of the shipped plume config (ref: pytorch/plumeConfig.yaml)."""
    base = dict(
        dt=0.1,
        maccormack_strength=0.6,
        buoyancy_scale=0.25,
        gravity_scale=0.0,
        gravity_vec=(0.0, -1.0, 0.0),
        operating_density=0.0,
        viscosity=0.0,
        p_tol=0.0,
        jacobi_iter=200,
        sim_method="jacobi",
    )
    base.update(overrides)
    return SimConfig(**base)


def rayleigh_taylor_config(**overrides) -> SimConfig:
    """Defaults of the shipped RT config
    (ref: pytorch/rayleighTaylorConfig.yaml, rayleighTaylor.py:158-159)."""
    base = dict(
        dt=0.5,
        maccormack_strength=0.6,
        buoyancy_scale=1.0,
        gravity_scale=0.0,
        gravity_vec=(0.0, 1.0, 0.0),
        p_tol=0.0,
        jacobi_iter=200,
        periodic_y=True,
        periodic_x=False,
        sim_method="jacobi",
    )
    base.update(overrides)
    return SimConfig(**base)


def cylinder_config(viscosity: float, **overrides) -> SimConfig:
    """Cylinder physics (ref: pytorch/cylinder.py:205-209). The reference's
    cylinder batch carries no density field, so scalar advection never runs
    there (lib/simulate.py:72-81) — advect_density=False matches that."""
    base = dict(
        dt=0.1,
        maccormack_strength=0.6,
        buoyancy_scale=0.0,
        gravity_scale=0.0,
        viscosity=viscosity,
        p_tol=0.0,
        jacobi_iter=34,
        advect_density=False,
        sim_method="jacobi",
    )
    base.update(overrides)
    return SimConfig(**base)
