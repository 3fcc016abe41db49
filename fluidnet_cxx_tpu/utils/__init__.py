from .diagnostics import (
    LossLogger,
    StepTimer,
    divergence_norms,
    mean_density,
    profile_trace,
    rt_interface_distance,
)
from .plotting import (
    plot_field,
    plot_loss_history,
    plot_sim_snapshot,
    save_density_png,
)
from .vtk_export import write_vtk

__all__ = [
    "LossLogger", "StepTimer", "divergence_norms", "mean_density",
    "profile_trace", "rt_interface_distance",
    "plot_field", "plot_loss_history", "plot_sim_snapshot",
    "save_density_png", "write_vtk",
]
