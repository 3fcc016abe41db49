from .fluidnet import (
    summary,
    FluidNet,
    FluidNetTower,
    assemble_inputs,
    init_params,
    make_project_fn,
    scale_std,
)
from .multi_scale import MultiScaleNet
from .punet import PUNet, depth_to_space, space_to_depth

__all__ = [
    "FluidNet", "FluidNetTower", "MultiScaleNet", "PUNet",
    "assemble_inputs", "depth_to_space", "init_params", "make_project_fn",
    "scale_std", "space_to_depth", "summary",
]
