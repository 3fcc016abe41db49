"""Source terms: buoyancy, gravity, explicit viscosity, scalar correction.

Gravity-vector convention matches the reference callers: the caller passes
``gravity = -scale * gravityVec`` (ref: pytorch/lib/simulate.py:99-115) and
these ops multiply by ``dt`` only — NO division by dx, following the Python
stack that the nets were trained with (ref: pytorch/lib/fluid/source_terms.py:47
vs solver_cpp/src/sourceTerms/source_term.cpp:52 which divides by dx).
"""
import jax.numpy as jnp

from ..celltype import EMPTY, FLUID
from .common import border_mask, nb


def add_buoyancy(U, flags, density, gravity, rho_star, dt):
    """Boussinesq buoyancy on interior fluid faces.

    u(i,j) += g_x*dt * (0.5*(rho(i,j)+rho(i-1,j)) - rho_star) where both the
    cell and its left neighbour are fluid; v symmetric in y.
    (ref: pytorch/lib/fluid/source_terms.py:6-116)
    """
    _, h, w = flags.shape
    u, v = U[:, 0], U[:, 1]
    strength = gravity * dt
    fl = flags == FLUID
    cont = fl & (~border_mask(h, w, 1))

    fac_x = strength[0] * (0.5 * (density + nb(density, 0, -1)) - rho_star)
    fac_y = strength[1] * (0.5 * (density + nb(density, -1, 0)) - rho_star)
    u = jnp.where(cont & nb(fl, 0, -1), u + fac_x, u)
    v = jnp.where(cont & nb(fl, -1, 0), v + fac_y, v)
    return jnp.stack([u, v], axis=1)


def add_gravity(U, flags, gravity, dt):
    """Constant body force on interior faces between fluid/empty cells.

    Face mask (x shown): neighbour(i-1) fluid, OR (neighbour(i-1) empty AND
    cell fluid); the cell itself must be fluid or empty and interior.
    (ref: pytorch/lib/fluid/source_terms.py:122-219)
    """
    _, h, w = flags.shape
    u, v = U[:, 0], U[:, 1]
    force = gravity * dt
    fl = flags == FLUID
    em = flags == EMPTY
    cont = (fl | em) & (~border_mask(h, w, 1))

    mask_x = cont & (nb(fl, 0, -1) | (nb(em, 0, -1) & fl))
    mask_y = cont & (nb(fl, -1, 0) | (nb(em, -1, 0) & fl))
    u = jnp.where(mask_x, u + force[0], u)
    v = jnp.where(mask_y, v + force[1], v)
    return jnp.stack([u, v], axis=1)


def add_viscosity(dt, U, flags, viscosity):
    """Explicit viscous diffusion, 5-point Laplacian, interior faces.

    u' = mask * (u + dt*nu*(u_E + u_N + u_W + u_S - 4u)) where the mask is
    fluid(i,j) & fluid(i-1,j) for u (fluid(i,j-1) for v); faces NOT in the
    mask are zeroed on the interior, exactly as the reference's
    multiply-by-mask formulation does.
    (ref: pytorch/lib/fluid/viscosity.py:40-70. The reference's 4th stencil
    term reads the (j-1, i-1) diagonal — an indexing bug; we use the correct
    symmetric (j-1, i) south neighbour.)
    """
    _, h, w = flags.shape
    fl = flags == FLUID

    def lap(c):
        return nb(c, 0, 1) + nb(c, 1, 0) + nb(c, 0, -1) + nb(c, -1, 0) - 4.0 * c

    u, v = U[:, 0], U[:, 1]
    mask_u = fl & nb(fl, 0, -1)
    mask_v = fl & nb(fl, -1, 0)
    u_new = jnp.where(mask_u, u + dt * viscosity * lap(u), 0.0)
    v_new = jnp.where(mask_v, v + dt * viscosity * lap(v), 0.0)
    interior = ~border_mask(h, w, 1)
    return jnp.stack(
        [jnp.where(interior, u_new, u), jnp.where(interior, v_new, v)], axis=1
    )


def correct_scalar(dt, src, div, flags):
    """Variable-density correction: rho += dt*0.5*rho*div in fluid cells
    (Guermond–Salgado; ref: pytorch/lib/fluid/cpp/advection.py:9-12)."""
    return jnp.where(flags == FLUID, src + dt * 0.5 * src * div, src)


def add_vorticity_confinement(U, flags, strength, dt):
    """Vorticity confinement (Fedkiw et al.): re-inject small-scale swirl
    lost to numerical diffusion.

    f = eps * dx * (N x omega),  N = grad|omega| / ||grad|omega|||

    The original FluidNet carries this op (ref: solver_cpp/src/
    fluidnet_implementation/tfluids.cpp:1298) but the reference never
    re-implemented it in its vectorised stack; provided here as an optional
    source term. Applied on interior fluid faces; 2-D (omega is the scalar
    z-vorticity at cell centres).
    """
    from .grid import curl2d

    _, h, w = flags.shape
    u, v = U[:, 0], U[:, 1]
    fl = flags == FLUID

    omega = curl2d(U)  # (b, h, w), zero border
    mag = jnp.abs(omega)
    # centred gradient of |omega|
    gx = 0.5 * (nb(mag, 0, 1) - nb(mag, 0, -1))
    gy = 0.5 * (nb(mag, 1, 0) - nb(mag, -1, 0))
    norm = jnp.sqrt(gx * gx + gy * gy) + 1e-12
    nx_, ny_ = gx / norm, gy / norm
    # N x omega (2-D: (Ny*w, -Nx*w)) at cell centres
    fx = ny_ * omega
    fy = -nx_ * omega
    # average to faces, scale, apply on interior fluid faces
    fx_face = 0.5 * (fx + nb(fx, 0, -1))
    fy_face = 0.5 * (fy + nb(fy, -1, 0))
    cont = fl & (~border_mask(h, w, 1))
    u = jnp.where(cont & nb(fl, 0, -1), u + strength * dt * fx_face, u)
    v = jnp.where(cont & nb(fl, -1, 0), v + strength * dt * fy_face, v)
    return jnp.stack([u, v], axis=1)
