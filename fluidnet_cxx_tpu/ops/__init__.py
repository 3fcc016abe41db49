from .advection import EULER, MACCORMACK, advect_scalar, advect_velocity
from .common import border_mask, cell_index_grid, gather2d, interior_mask, nb
from .grid import (
    curl2d,
    get_at_mac_x,
    get_at_mac_y,
    get_centered,
    get_dx,
    interpol,
    interpol_component,
    interpol_with_fluid,
)
from .jacobi import solve_jacobi, solve_jacobi_fixed
from .line_trace import calc_line_trace
from .source_terms import (
    add_buoyancy,
    add_gravity,
    add_viscosity,
    add_vorticity_confinement,
    correct_scalar,
)
from .stencils import (
    empty_domain,
    flags_to_occupancy,
    set_wall_bcs,
    set_wall_bcs_stick,
    velocity_divergence,
    velocity_update,
)

__all__ = [
    "EULER", "MACCORMACK", "advect_scalar", "advect_velocity",
    "border_mask", "cell_index_grid", "gather2d", "interior_mask", "nb",
    "curl2d", "get_at_mac_x", "get_at_mac_y", "get_centered", "get_dx",
    "interpol", "interpol_component", "interpol_with_fluid",
    "solve_jacobi", "solve_jacobi_fixed", "calc_line_trace",
    "add_buoyancy", "add_gravity", "add_viscosity",
    "add_vorticity_confinement", "correct_scalar",
    "empty_domain", "flags_to_occupancy", "set_wall_bcs",
    "set_wall_bcs_stick", "velocity_divergence", "velocity_update",
]
