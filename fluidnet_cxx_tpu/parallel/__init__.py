from .halo import solve_jacobi_sharded
from .mesh import (
    batch_sharding,
    make_mesh,
    replicated,
    state_sharding,
)

__all__ = [
    "solve_jacobi_sharded", "batch_sharding", "make_mesh",
    "replicated", "state_sharding",
]
