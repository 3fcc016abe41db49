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
