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

__all__ = [
    "FluidNet", "FluidNetTower", "MultiScaleNet",
    "assemble_inputs", "init_params", "make_project_fn", "scale_std",
    "summary",
]
