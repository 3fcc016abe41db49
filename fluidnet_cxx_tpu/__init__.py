"""fluidnet_cxx_tpu — a TPU-native (JAX/XLA/Pallas) fluid-simulation framework
with the capabilities of jolibrain/fluidnet_cxx: incompressible Eulerian flow
on a MAC staggered grid, MacCormack semi-Lagrangian advection, Jacobi or
learned-CNN pressure projection, differentiable training with short- and
long-term divergence losses, and the plume / Rayleigh-Taylor / cylinder
scenes.
"""
__version__ = "0.1.0"

from . import ops
from .celltype import CellType
from .state import SimState, create_state

__all__ = ["ops", "CellType", "SimState", "create_state", "__version__"]
