"""Synthetic training-data generator.

The reference trains on Mantaflow-dumped scene pairs (divergent state,
projected state). When that dataset is unavailable, this module manufactures
statistically similar pairs on-device: smooth random velocity fields +
sphere-ish obstacles + smooth density blobs, with the ground-truth projection
computed by a long Jacobi solve (the classical solver is the label source,
exactly the role Mantaflow plays for the reference).
"""
import jax
import jax.numpy as jnp

from ..celltype import FLUID, OBSTACLE
from ..ops.jacobi import solve_jacobi_fixed
from ..ops.stencils import (
    empty_domain,
    set_wall_bcs,
    velocity_divergence,
    velocity_update,
)
from .dataset import Sample


def _smooth_noise(key, b, h, w, cutoff=8):
    """Band-limited random field via low-frequency Fourier synthesis."""
    kr, ki = jax.random.split(key)
    spec = jax.random.normal(kr, (b, h, w)) + 1j * jax.random.normal(
        ki, (b, h, w)
    )
    fy = jnp.fft.fftfreq(h)[None, :, None]
    fx = jnp.fft.fftfreq(w)[None, None, :]
    mask = (jnp.abs(fy) < cutoff / h) & (jnp.abs(fx) < cutoff / w)
    field = jnp.fft.ifft2(spec * mask).real
    field = field / (jnp.std(field, axis=(1, 2), keepdims=True) + 1e-8)
    return field.astype(jnp.float32)


def _random_obstacles(key, b, h, w, max_spheres=3):
    """Flags grid with a random count of random discs (mimicking the
    reference dataset's sphere scenes)."""
    flags = empty_domain(b, h, w)
    keys = jax.random.split(key, 4)
    n = jax.random.randint(keys[0], (b,), 0, max_spheres + 1)
    cx = jax.random.uniform(keys[1], (b, max_spheres), minval=0.2 * w,
                            maxval=0.8 * w)
    cy = jax.random.uniform(keys[2], (b, max_spheres), minval=0.2 * h,
                            maxval=0.8 * h)
    r = jax.random.uniform(keys[3], (b, max_spheres), minval=0.03 * min(h, w),
                           maxval=0.12 * min(h, w))
    X = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    Y = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    inside = (
        (X - cx[..., None, None]) ** 2 + (Y - cy[..., None, None]) ** 2
        <= (r**2)[..., None, None]
    )
    active = (
        jnp.arange(max_spheres)[None, :] < n[:, None]
    )[..., None, None]
    any_inside = jnp.any(inside & active, axis=1)
    return jnp.where(any_inside, OBSTACLE, flags).astype(jnp.int32)


def _gaussian_bumps(key, b, h, w, n=3, sigma_frac=(0.02, 0.12)):
    """Sum of n random Gaussian bumps per sample, unit peak amplitude each."""
    ks = jax.random.split(key, 4)
    cx = jax.random.uniform(ks[0], (b, n, 1, 1), minval=0.1 * w, maxval=0.9 * w)
    cy = jax.random.uniform(ks[1], (b, n, 1, 1), minval=0.1 * h, maxval=0.9 * h)
    sg = jax.random.uniform(ks[2], (b, n, 1, 1), minval=sigma_frac[0] * w,
                            maxval=sigma_frac[1] * w)
    amp = jax.random.uniform(ks[3], (b, n, 1, 1), minval=-1.0, maxval=1.0)
    X = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
    Y = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
    g = amp * jnp.exp(-((X - cx) ** 2 + (Y - cy) ** 2) / (2 * sg**2))
    return jnp.sum(g, axis=1)


def generate_batch(key, b: int, h: int, w: int, jacobi_iters: int = 600):
    """Returns a Sample of (divergent input, projected target) pairs.

    Field mix: band-limited smooth noise (generic turbulence-like states) plus
    localized Gaussian jets and density blobs (plume/inlet-like states), so
    the learned projection sees both regimes.
    """
    k_u, k_v, k_rho, k_obs, k_amp, k_ju, k_jv, k_blob, k_jamp = (
        jax.random.split(key, 9)
    )
    amp = jax.random.uniform(k_amp, (b, 1, 1), minval=0.5, maxval=4.0)
    jet_amp = jax.random.uniform(k_jamp, (b, 1, 1), minval=0.0, maxval=4.0)
    u = _smooth_noise(k_u, b, h, w) * amp + _gaussian_bumps(k_ju, b, h, w) * jet_amp
    v = _smooth_noise(k_v, b, h, w) * amp + _gaussian_bumps(k_jv, b, h, w) * jet_amp
    U_div = jnp.stack([u, v], axis=1)
    flags = _random_obstacles(k_obs, b, h, w)
    density = jnp.clip(
        _smooth_noise(k_rho, b, h, w) * 0.5
        + 0.5
        + _gaussian_bumps(k_blob, b, h, w),
        0.0,
        1.0,
    )
    density = jnp.where(flags == FLUID, density, 0.0)

    U_div = set_wall_bcs(U_div, flags)
    rhs = velocity_divergence(U_div, flags)
    p = solve_jacobi_fixed(flags, rhs, jacobi_iters)
    U_proj = set_wall_bcs(velocity_update(p, U_div, flags), flags)

    return Sample(
        p_div=jnp.zeros_like(p),
        U_div=U_div,
        flags=flags,
        density_div=density,
        p_target=p,
        U_target=U_proj,
        density_target=density,
    )


def write_synthetic_dataset(
    out_dir: str,
    n_scenes: int,
    steps_per_scene: int = 4,
    h: int = 128,
    w: int = 128,
    seed: int = 0,
    jacobi_iters: int = 600,
):
    """Materialise a synthetic dataset on disk in the framework's .npz scene
    layout (see data/dataset.py), so the standard loader path is exercised."""
    import os

    import numpy as np

    gen = jax.jit(
        lambda k: generate_batch(k, steps_per_scene, h, w, jacobi_iters)
    )
    key = jax.random.PRNGKey(seed)
    for s in range(n_scenes):
        key, sub = jax.random.split(key)
        batch = gen(sub)
        scene_dir = os.path.join(out_dir, f"{s:06d}")
        os.makedirs(scene_dir, exist_ok=True)
        for t in range(steps_per_scene):
            np.savez(
                os.path.join(scene_dir, f"{t:06d}.npz"),
                **{
                    k: np.asarray(getattr(batch, k)[t])
                    for k in Sample._fields
                },
            )
