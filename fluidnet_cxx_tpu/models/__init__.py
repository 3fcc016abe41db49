from .fluidnet import (
    summary,
    FluidNet,
    FluidNetTower,
    assemble_inputs,
    init_params,
    make_project_fn,
    make_project_fn_fused_forward,
    scale_std,
)
from .mg_coarse import (
    MGCoarseConfig,
    MGCoarseNet,
    load_mg_coarse,
    make_project_fn_mg_learned,
)
from .multi_scale import MultiScaleNet
from .punet import PUNet, depth_to_space, space_to_depth
from .punet3d import (FluidNet3, PUNet3, init_params3, make_project_fn3,
                      make_project_fn3_fused_forward)

__all__ = [
    "FluidNet", "FluidNet3", "FluidNetTower", "MGCoarseConfig",
    "MGCoarseNet", "MultiScaleNet", "PUNet",
    "load_mg_coarse", "make_project_fn_mg_learned",
    "PUNet3", "assemble_inputs", "depth_to_space", "init_params",
    "init_params3", "make_project_fn", "make_project_fn3",
    "make_project_fn3_fused_forward",
    "make_project_fn_fused_forward", "scale_std",
    "space_to_depth", "summary",
]
