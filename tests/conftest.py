"""Test configuration: run everything on CPU with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the driver
benchmarks on the real chip separately)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The container's sitecustomize registers a remote TPU backend and pins
# jax_platforms to "axon,cpu"; force tests back onto the local CPU backend
# (must happen before any backend initialisation).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is compile-bound on this 1-core
# host; cached executables cut repeat runs from ~13 min to ~2 min.
jax.config.update("jax_compilation_cache_dir", "/tmp/fluidnet_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest

assert jax.devices()[0].platform == "cpu"


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_flags(rng, b, h, w, p_obstacle=0.15, p_empty=0.0):
    """Empty-domain flags with random interior obstacle (and empty) cells."""
    from fluidnet_cxx_tpu.oracle import np_oracle as orc

    flags = np.full((b, h, w), orc.FLUID, np.int32)
    flags[:, 0, :] = orc.OBSTACLE
    flags[:, -1, :] = orc.OBSTACLE
    flags[:, :, 0] = orc.OBSTACLE
    flags[:, :, -1] = orc.OBSTACLE
    r = rng.random((b, h, w))
    interior = np.zeros((b, h, w), bool)
    interior[:, 1:-1, 1:-1] = True
    flags[(r < p_obstacle) & interior] = orc.OBSTACLE
    if p_empty > 0:
        flags[(r >= p_obstacle) & (r < p_obstacle + p_empty) & interior] = (
            orc.EMPTY
        )
    return flags
