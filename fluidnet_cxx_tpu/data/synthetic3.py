"""Synthetic 3-D training data: divergent velocity fields with solver labels.

3-D twin of data/synthetic.py for the learned 3-D projection prototype
(the reference has no 3-D training path at all). Band-limited random
velocity + Gaussian jets; ground truth from a long 6-neighbour Jacobi solve.
"""
import jax
import jax.numpy as jnp

from ..ops import ops3d


def _smooth_noise3(key, b, d, h, w, cutoff=6):
    kr, ki = jax.random.split(key)
    spec = jax.random.normal(kr, (b, d, h, w)) + 1j * jax.random.normal(
        ki, (b, d, h, w)
    )
    fz = jnp.fft.fftfreq(d)[None, :, None, None]
    fy = jnp.fft.fftfreq(h)[None, None, :, None]
    fx = jnp.fft.fftfreq(w)[None, None, None, :]
    mask = (
        (jnp.abs(fz) < cutoff / d)
        & (jnp.abs(fy) < cutoff / h)
        & (jnp.abs(fx) < cutoff / w)
    )
    field = jnp.fft.ifftn(spec * mask, axes=(1, 2, 3)).real
    field = field / (jnp.std(field, axis=(1, 2, 3), keepdims=True) + 1e-8)
    return field.astype(jnp.float32)


def generate_batch3(key, b, d, h, w, jacobi_iters: int = 400):
    """Returns (U_div, flags, p_target, U_target)."""
    ks = jax.random.split(key, 4)
    amp = jax.random.uniform(ks[3], (b, 1, 1, 1), minval=0.5, maxval=3.0)
    U_div = jnp.stack(
        [_smooth_noise3(ks[c], b, d, h, w) * amp for c in range(3)], axis=1
    )
    flags = ops3d.empty_domain3(b, d, h, w)
    U_div = ops3d.set_wall_bcs3(U_div, flags)
    rhs = ops3d.velocity_divergence3(U_div, flags)
    p = ops3d.solve_jacobi_fixed3(flags, rhs, jacobi_iters)
    U_proj = ops3d.set_wall_bcs3(
        ops3d.velocity_update3(p, U_div, flags), flags
    )
    return U_div, flags, p, U_proj
