"""fluidnet_cxx_tpu — a TPU-native (JAX/XLA/Pallas) fluid-simulation framework
with the capabilities of jolibrain/fluidnet_cxx: incompressible Eulerian flow
on a MAC staggered grid, MacCormack semi-Lagrangian advection, Jacobi or
learned-CNN pressure projection, differentiable training with short- and
long-term divergence losses, and the plume / Rayleigh-Taylor / cylinder
scenes.
"""
__version__ = "0.1.0"

import os as _os

if _os.environ.get("FLUIDNET_NO_COMPILE_CACHE") != "1":
    # Compiled-executable disk cache: compiles on this host are expensive
    # (1 CPU core locally; remote-compile tunnel for the TPU), so persist
    # them across processes.
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        "/tmp/fluidnet_jax_cache"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from . import ops
from .celltype import CellType
from .state import SimState, create_state

__all__ = ["ops", "CellType", "SimState", "create_state", "__version__"]
