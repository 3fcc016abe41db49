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
    """Returns (U_div, flags, p_target, U_target).

    Band-limited noise PLUS a wall-adjacent inlet jet: the closed-loop
    plume's divergence error concentrates at the inlet slab (r5 probe:
    top-0.1% |div| cells at y~10, argmax y=3, no patch-seam structure),
    because a net trained on smooth interior noise never sees the
    near-wall jet divergence pattern — the 3-D twin of the 2-D
    '--plumeFrames' lesson (RESULTS: rollout distribution is the data
    that matters)."""
    ks = jax.random.split(key, 8)
    amp = jax.random.uniform(ks[3], (b, 1, 1, 1), minval=0.5, maxval=3.0)
    U_div = jnp.stack(
        [_smooth_noise3(ks[c], b, d, h, w) * amp for c in range(3)], axis=1
    )
    # Inlet-like jet: an upward velocity column entering from the bottom
    # wall (random center/radius/strength), the plume scene's inlet shape.
    zz = jnp.arange(d, dtype=jnp.float32)[None, :, None, None]
    yy = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    cz = jax.random.uniform(ks[4], (b, 1, 1, 1), minval=0.25 * d,
                            maxval=0.75 * d)
    cx = jax.random.uniform(ks[5], (b, 1, 1, 1), minval=0.25 * w,
                            maxval=0.75 * w)
    rad = jax.random.uniform(ks[6], (b, 1, 1, 1), minval=0.06 * w,
                             maxval=0.2 * w)
    jamp = jax.random.uniform(ks[7], (b, 1, 1, 1), minval=0.0, maxval=2.5)
    r2 = ((zz - cz) ** 2 + (xx - cx) ** 2) / (rad ** 2)
    jet = jamp * jnp.exp(-r2) * jnp.exp(-yy / (0.15 * h))
    U_div = U_div.at[:, 1].add(jet)
    flags = ops3d.empty_domain3(b, d, h, w)
    U_div = ops3d.set_wall_bcs3(U_div, flags)
    rhs = ops3d.velocity_divergence3(U_div, flags)
    p = ops3d.solve_jacobi_fixed3(flags, rhs, jacobi_iters)
    U_proj = ops3d.set_wall_bcs3(
        ops3d.velocity_update3(p, U_div, flags), flags
    )
    return U_div, flags, p, U_proj
