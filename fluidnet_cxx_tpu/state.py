"""Simulation state pytree.

TPU-native replacement for the reference's mutable ``batch_dict`` of 5-D CUDA
tensors (ref: pytorch/lib/simulate.py:28-41): a frozen NamedTuple of arrays
that flows through a functional, jittable ``step`` (state' = step(state)).

Layout: scalars ``(b, h, w)``, MAC velocity ``(b, 2, h, w)``, flags int32.
Optional boundary-condition fields mirror the reference's
UBC/UBCInvMask/densityBC/densityBCInvMask masks and flags_stick.
"""
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .ops.stencils import empty_domain


class SimState(NamedTuple):
    p: jnp.ndarray        # (b, h, w) pressure
    U: jnp.ndarray        # (b, 2, h, w) MAC velocity
    flags: jnp.ndarray    # (b, h, w) int32 cell types
    density: jnp.ndarray  # (b, h, w)
    # Constant-value BC masks, applied as  x = x * inv_mask + bc
    # (ref: pytorch/lib/simulate.py:4-26 setConstVals).
    U_bc: Optional[jnp.ndarray] = None           # (b, 2, h, w)
    U_bc_inv_mask: Optional[jnp.ndarray] = None  # (b, 2, h, w)
    density_bc: Optional[jnp.ndarray] = None
    density_bc_inv_mask: Optional[jnp.ndarray] = None
    flags_stick: Optional[jnp.ndarray] = None    # (b, h, w) int32

    @property
    def resolution(self):
        b, h, w = self.flags.shape
        return b, h, w


def create_state(b: int, h: int, w: int, bnd: int = 1) -> SimState:
    """Zeroed fields over an empty domain (fluid interior, obstacle wall)."""
    return SimState(
        p=jnp.zeros((b, h, w), jnp.float32),
        U=jnp.zeros((b, 2, h, w), jnp.float32),
        flags=empty_domain(b, h, w, bnd),
        density=jnp.zeros((b, h, w), jnp.float32),
    )


def from_reference_layout(p5, U5, flags5, density5) -> SimState:
    """Convert reference-convention 5-D ``(b, c, 1, h, w)`` numpy arrays
    (e.g. from Manta .bin files, ref: pytorch/lib/load_manta_data.py) into a
    SimState."""
    return SimState(
        p=jnp.asarray(np.asarray(p5)[:, 0, 0], jnp.float32),
        U=jnp.asarray(np.asarray(U5)[:, :, 0], jnp.float32),
        flags=jnp.asarray(np.asarray(flags5)[:, 0, 0], jnp.int32),
        density=jnp.asarray(np.asarray(density5)[:, 0, 0], jnp.float32),
    )


def to_reference_layout(state: SimState):
    """SimState -> reference 5-D numpy arrays (p, U, flags, density)."""
    p = np.asarray(state.p)[:, None, None]
    U = np.asarray(state.U)[:, :, None]
    flags = np.asarray(state.flags, np.float32)[:, None, None]
    density = np.asarray(state.density)[:, None, None]
    return p, U, flags, density
