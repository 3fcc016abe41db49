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

    # Separate cache namespaces per platform AND per compile host: with the
    # axon sitecustomize loaded, even CPU compiles go through the remote
    # compile service, whose AOT results carry that machine's CPU features
    # and SIGILL-risk on this host.
    import sys as _sys

    _plat = _os.environ.get("JAX_PLATFORMS", "default").replace(",", "_")
    if any(m.startswith("axon") for m in _sys.modules):
        _plat += "_remote"
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get("JAX_COMPILATION_CACHE_DIR",
                        f"/tmp/fluidnet_jax_cache_{_plat}"),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from . import ops
from .celltype import CellType
from .state import SimState, create_state

__all__ = ["ops", "CellType", "SimState", "create_state", "__version__"]
