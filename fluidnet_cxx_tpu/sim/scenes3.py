"""3-D scene builders (beyond-reference: the reference has no working 3-D
path, README.md:31).

``create_plume_scene3`` is the 3-D generalisation of the 2-D plume scene
(sim/scenes.py, ref: pytorch/lib/fluid/init_conditions.py:4-86): a circular
inlet disc on the bottom wall (rows y in [0, 4)) injecting density and
vertical velocity through const-BC masks re-imposed every step.
"""
import jax.numpy as jnp
import numpy as np

from ..ops import ops3d
from .step3d import SimState3


def create_plume_scene3(
    d: int, h: int, w: int,
    density_val: float = 0.1,
    u_scale: float = 1.0,
    rad: float = 0.145,
) -> SimState3:
    b = 1
    flags = ops3d.empty_domain3(b, d, h, w)

    zz, xx = np.mgrid[0:d, 0:w].astype(np.float32)
    cz, cx = (d - 1) / 2.0, (w - 1) / 2.0
    radius = rad * min(d, w)
    disc = ((xx - cx) ** 2 + (zz - cz) ** 2) <= radius * radius  # (d, w)

    U_bc = np.zeros((b, 3, d, h, w), np.float32)
    U_inv = np.ones_like(U_bc)
    rho_bc = np.zeros((b, d, h, w), np.float32)
    rho_inv = np.ones_like(rho_bc)

    # Inlet rows 0..3 (2-D twin uses rows 0..3 of the bottom wall).
    for y in range(4):
        U_bc[:, 1, :, y, :] = np.where(disc, u_scale, 0.0)
        U_inv[:, :, :, y, :] = np.where(disc, 0.0, 1.0)[None, None]
        rho_bc[:, :, y, :] = np.where(disc, density_val, 0.0)
        rho_inv[:, :, y, :] = np.where(disc, 0.0, 1.0)

    U = jnp.asarray(U_bc)  # start from the inlet profile
    return SimState3(
        p=jnp.zeros((b, d, h, w), jnp.float32),
        U=U,
        flags=flags,
        density=jnp.asarray(rho_bc),
        U_bc=jnp.asarray(U_bc),
        U_bc_inv_mask=jnp.asarray(U_inv),
        density_bc=jnp.asarray(rho_bc),
        density_bc_inv_mask=jnp.asarray(rho_inv),
    )


def create_cylinder_scene3(
    d: int = 32,
    h: int = 128,
    w: int = 384,
    center_x: float = 64.0,
    center_y: float = None,
    radius: float = 12.5,
    inlet_vel: float = 1.0,
    reynolds: float = 100.0,
):
    """Flow past a z-extruded cylinder with no-slip (stick) obstacle and a
    left-wall inlet — the 3-D twin of create_cylinder_scene
    (ref: pytorch/cylinder.py:40-101). The disc spans the full depth;
    exercises viscosity3 + stick BCs + vorticity shedding in 3-D.

    Returns (state, viscosity) with viscosity = |u|*D/Re."""
    from ..celltype import OBSTACLE, STICK

    if center_y is None:
        center_y = h // 2
    b = 1
    flags = ops3d.empty_domain3(b, d, h, w)
    X = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    Y = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    cyl = (X - center_x) ** 2 + (Y - center_y) ** 2 <= radius * radius
    cyl = jnp.broadcast_to(cyl, (b, d, h, w))
    flags = jnp.where(cyl, OBSTACLE, flags).astype(jnp.int32)
    flags_stick = jnp.where(cyl, STICK, flags).astype(jnp.int32)

    inlet = np.zeros((d, h, w), bool)
    inlet[1:-1, 1:-1, :3] = True

    U_bc = np.zeros((b, 3, d, h, w), np.float32)
    U_bc[:, 0][:, inlet] = inlet_vel
    U_inv = np.ones((b, 3, d, h, w), np.float32)
    U_inv[:, :, inlet] = 0.0

    U0 = np.zeros((b, 3, d, h, w), np.float32)
    U0[:, 0] = inlet_vel

    viscosity = float(abs(inlet_vel) * radius * 2.0 / reynolds)
    state = SimState3(
        p=jnp.zeros((b, d, h, w), jnp.float32),
        U=jnp.asarray(U0),
        flags=flags,
        density=jnp.zeros((b, d, h, w), jnp.float32),
        flags_stick=flags_stick,
        U_bc=jnp.asarray(U_bc),
        U_bc_inv_mask=jnp.asarray(U_inv),
    )
    return state, viscosity
