from .scenes import (
    add_box2d,
    add_cylinder,
    create_cylinder_scene,
    create_plume_scene,
    create_rayleigh_taylor_scene,
    cylinder_config,
    plume_config,
    rayleigh_taylor_config,
)
from .step import DynParams, apply_const_vals, simulate_step

__all__ = [
    "add_box2d", "add_cylinder", "create_cylinder_scene",
    "create_plume_scene", "create_rayleigh_taylor_scene",
    "cylinder_config", "plume_config", "rayleigh_taylor_config",
    "DynParams", "apply_const_vals", "simulate_step",
]
