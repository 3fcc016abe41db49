"""Jacobi solver: oracle parity + the reference's convergence property test
(post-projection divergence, ref: solver_cpp/test/test_fluid.cpp:412-441)."""
import numpy as np

from conftest import random_flags
from fluidnet_cxx_tpu import ops
from fluidnet_cxx_tpu.oracle import np_oracle as orc


def make_div_field(rng, flags):
    b, h, w = flags.shape
    U = rng.standard_normal((b, 2, h, w)).astype(np.float32)
    U = np.asarray(ops.set_wall_bcs(U, flags))
    return U, np.asarray(ops.velocity_divergence(U, flags))


def test_jacobi_matches_oracle(rng):
    flags = random_flags(rng, 1, 14, 18, p_obstacle=0.1)
    _, div = make_div_field(rng, flags)
    p_got = np.asarray(ops.solve_jacobi_fixed(flags, div, 25))
    p_want, _ = orc.solve_jacobi(flags, div, p_tol=0.0, max_iter=25)
    np.testing.assert_allclose(p_got, p_want, atol=1e-5)


def test_jacobi_residual_and_early_exit(rng):
    flags = random_flags(rng, 2, 16, 16, p_obstacle=0.0)
    _, div = make_div_field(rng, flags)
    p, res = ops.solve_jacobi(flags, div, p_tol=1e-4, max_iter=3000)
    assert float(res) < 1e-4
    p_fix, res_fix = ops.solve_jacobi_fixed(flags, div, 50, with_residual=True)
    p_w, res_w = orc.solve_jacobi(flags, div, p_tol=0.0, max_iter=50)
    np.testing.assert_allclose(np.asarray(p_fix), p_w, atol=1e-5)
    assert abs(float(res_fix) - res_w) < 1e-5


def test_projection_kills_divergence(rng):
    """After p-solve + velocity update, max |div| < 1e-5 in fluid cells
    (property check from the reference's golden test)."""
    flags = random_flags(rng, 1, 34, 34, p_obstacle=0.05)
    U, div = make_div_field(rng, flags)
    p, res = ops.solve_jacobi(flags, div, p_tol=1e-6, max_iter=20000)
    U2 = np.asarray(ops.velocity_update(p, U, flags))
    U2 = np.asarray(ops.set_wall_bcs(U2, flags))
    div2 = np.asarray(ops.velocity_divergence(U2, flags))
    assert np.abs(div2).max() < 1e-4


def test_jacobi_is_differentiable(rng):
    import jax
    import jax.numpy as jnp

    flags = random_flags(rng, 1, 16, 16, p_obstacle=0.0)
    _, div = make_div_field(rng, flags)

    def loss(d):
        p = ops.solve_jacobi_fixed(flags, d, 10)
        return jnp.sum(p**2)

    g = jax.grad(loss)(jnp.asarray(div))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_damped_polish_kills_nyquist_stripes(rng):
    """Plain Jacobi leaves near-Nyquist error modes undamped (iteration
    eigenvalue -> -1); the weighted (2/3) smoother kills them — the reason
    ModelConfig.polish_damping exists."""
    import jax.numpy as jnp

    from fluidnet_cxx_tpu import ops

    h = w = 64
    flags = np.full((1, h, w), 1, np.int32)
    flags[:, 0], flags[:, -1], flags[:, :, 0], flags[:, :, -1] = 2, 2, 2, 2
    U = rng.standard_normal((1, 2, h, w)).astype(np.float32)
    rhs = np.asarray(ops.velocity_divergence(U, flags))
    p_ref = np.asarray(ops.solve_jacobi_fixed(flags, rhs, 2000))

    # checkerboard perturbation: the plain-Jacobi iteration eigenvalue is
    # exactly -1 there (the mode oscillates forever); damped 2/3 gives -1/3
    yy, xx = np.mgrid[0:h, 0:w]
    checker = ((-1.0) ** (yy + xx)).astype(np.float32)[None]
    p0 = p_ref + 0.5 * checker

    err_plain = np.asarray(ops.solve_jacobi_fixed(
        flags, rhs, 16, p0=jnp.asarray(p0))) - p_ref
    err_damped = np.asarray(ops.solve_jacobi_fixed(
        flags, rhs, 16, p0=jnp.asarray(p0), damping=2.0 / 3.0)) - p_ref

    interior = np.zeros((1, h, w), bool)
    interior[:, 2:-2, 2:-2] = True
    e_p = np.abs(err_plain[interior]).max()
    e_d = np.abs(err_damped[interior]).max()
    # plain: stripe survives nearly intact; damped: crushed by (1/3)^16
    assert e_p > 0.2
    # the 0.5-amplitude checkerboard is crushed by (1/3)^16; the remaining
    # ~0.016 is p_ref's own unconverged smooth tail, not the stripe
    assert e_d < 0.05
    assert e_d < e_p / 10
