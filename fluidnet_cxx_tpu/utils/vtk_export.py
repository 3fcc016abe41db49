"""VTK structured-grid export for ParaView.

Replaces the reference's pyevtk-based export (ref: pytorch/plume.py:311-420)
with a dependency-free legacy-VTK writer: density, pressure, cell-centred
velocity, divergence, and the gradients the reference exports (grad(p),
grad(rho)).
"""
import os

import numpy as np


def _grad_centered(f):
    """Central-difference gradient of a (h, w) field (interior; one-sided at
    the edges)."""
    gy, gx = np.gradient(f.astype(np.float64))
    return gx, gy


def write_vtk(path: str, state, extra_fields=None):
    """Write one 2-D snapshot as legacy VTK STRUCTURED_POINTS.

    ``state`` is a SimState (batch 0 is exported).
    """
    from ..ops.grid import get_centered
    from ..ops.stencils import velocity_divergence

    p = np.asarray(state.p)[0]
    rho = np.asarray(state.density)[0]
    flags = np.asarray(state.flags)[0]
    cc = np.asarray(get_centered(state.U))[0]
    div = np.asarray(velocity_divergence(state.U, state.flags))[0]
    h, w = p.shape

    gpx, gpy = _grad_centered(p)
    grx, gry = _grad_centered(rho)

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write("fluidnet_cxx_tpu snapshot\nASCII\n")
        f.write("DATASET STRUCTURED_POINTS\n")
        f.write(f"DIMENSIONS {w} {h} 1\n")
        f.write("ORIGIN 0 0 0\nSPACING 1 1 1\n")
        f.write(f"POINT_DATA {h * w}\n")

        def scal(name, a):
            f.write(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
            np.savetxt(f, a.reshape(-1, 1), fmt="%.6g")

        def vec(name, ax, ay):
            f.write(f"VECTORS {name} float\n")
            data = np.stack(
                [ax.ravel(), ay.ravel(), np.zeros(ax.size)], axis=1
            )
            np.savetxt(f, data, fmt="%.6g")

        scal("density", rho)
        scal("pressure", p)
        scal("divergence", div)
        scal("flags", flags.astype(np.float32))
        vec("velocity", cc[0], cc[1])
        vec("grad_p", gpx, gpy)
        vec("grad_rho", grx, gry)
        if extra_fields:
            for name, a in extra_fields.items():
                scal(name, np.asarray(a))
