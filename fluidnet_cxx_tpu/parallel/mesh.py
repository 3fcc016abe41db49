"""Device-mesh helpers.

The reference is single-GPU with no distributed backend (SURVEY.md §2.5);
here the "backend" is XLA collectives over ICI via jax.sharding. Two axes:

* ``dp`` — data parallelism over the training batch (the reference's batch
  dimension, scaled out),
* ``sx`` — spatial domain decomposition over the grid's x axis (the analogue
  of sequence parallelism for a stencil code; motivates the 8000x800
  cylinder domain, ref: pytorch/cylinder.py:163-164).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = None, dp: int = None, sx: int = None) -> Mesh:
    """Build a (dp, sx) mesh. Defaults: put everything on dp, sx as large a
    power-of-two factor as requested."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if dp is None and sx is None:
        # Favour dp; give sx a factor of 2 when available.
        sx = 2 if n % 2 == 0 and n > 1 else 1
        dp = n // sx
    elif dp is None:
        dp = n // sx
    elif sx is None:
        sx = n // dp
    assert dp * sx == n, f"mesh {dp}x{sx} != {n} devices"
    return Mesh(np.array(devices).reshape(dp, sx), ("dp", "sx"))


def batch_spec() -> P:
    """PartitionSpec for training batches: shard the leading batch dim over
    dp AND the trailing width dim over sx (fields are (b,...,h,w))."""
    return P("dp")


def batch_sharding(mesh: Mesh, batch):
    """NamedShardings for a trainer Batch pytree: batch dim over dp, width
    over sx."""
    def spec_for(x):
        ndim = x.ndim
        spec = ["dp"] + [None] * (ndim - 2) + ["sx"]
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, batch)


def state_sharding(mesh: Mesh, state):
    """Spatial sharding for a SimState: width over sx, batch over dp."""
    def spec_for(x):
        spec = ["dp"] + [None] * (x.ndim - 2) + ["sx"]
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(spec_for, state)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
