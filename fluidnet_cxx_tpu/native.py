"""ctypes bindings to the C++ runtime library (native/fluidnet_native.cpp).

Provides the fast Manta .bin parser for the data loader and the scalar-loop
C++ oracle kernels used in tests. Builds the shared library on first use via
``make``; every entry degrades gracefully (returns None / falls back to the
Python implementations) when a toolchain is unavailable.
"""
import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfluidnet_native.so")
_lib = None
_tried = False


def _float_p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _int_p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not os.path.isfile(_LIB_PATH):
            subprocess.run(
                ["make", "-C", _NATIVE_DIR], check=True,
                capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.solve_jacobi2d.restype = ctypes.c_float
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def load_manta_bin2d(path: str):
    """Fast .bin parse; returns (p, U, flags, density) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    nx = ctypes.c_int32()
    ny = ctypes.c_int32()
    nz = ctypes.c_int32()
    is3d = ctypes.c_int32()
    if lib.manta_bin_header(
        path.encode(), ctypes.byref(nx), ctypes.byref(ny),
        ctypes.byref(nz), ctypes.byref(is3d),
    ) != 0 or is3d.value != 0:
        return None
    h, w = ny.value, nx.value
    p = np.empty((h, w), np.float32)
    U = np.empty((2, h, w), np.float32)
    flags = np.empty((h, w), np.int32)
    rho = np.empty((h, w), np.float32)
    rc = lib.manta_bin_load2d(
        path.encode(), _float_p(p), _float_p(U), _int_p(flags),
        _float_p(rho), h, w,
    )
    if rc != 0:
        return None
    return p, U, flags, rho


def load_manta_bin3d(path: str):
    """Fast 3-D .bin parse; returns (p, U, flags, density) with shapes
    (d,h,w) / (3,d,h,w), or None on failure/2-D file."""
    lib = get_lib()
    if lib is None:
        return None
    nx = ctypes.c_int32()
    ny = ctypes.c_int32()
    nz = ctypes.c_int32()
    is3d = ctypes.c_int32()
    if lib.manta_bin_header(
        path.encode(), ctypes.byref(nx), ctypes.byref(ny),
        ctypes.byref(nz), ctypes.byref(is3d),
    ) != 0 or is3d.value != 1:
        return None
    d, h, w = nz.value, ny.value, nx.value
    p = np.empty((d, h, w), np.float32)
    U = np.empty((3, d, h, w), np.float32)
    flags = np.empty((d, h, w), np.int32)
    rho = np.empty((d, h, w), np.float32)
    rc = lib.manta_bin_load3d(
        path.encode(), _float_p(p), _float_p(U), _int_p(flags),
        _float_p(rho), d, h, w,
    )
    if rc != 0:
        return None
    return p, U, flags, rho


# -------------------------------------------------- C++ oracle wrappers

def velocity_divergence(U, flags):
    lib = get_lib()
    b, h, w = flags.shape
    out = np.zeros((b, h, w), np.float32)
    U = np.ascontiguousarray(U, np.float32)
    flags = np.ascontiguousarray(flags, np.int32)
    for bi in range(b):
        lib.velocity_divergence2d(
            _float_p(U[bi]), _int_p(flags[bi]), _float_p(out[bi]), h, w
        )
    return out


def velocity_update(p, U, flags):
    lib = get_lib()
    b, h, w = flags.shape
    out = np.ascontiguousarray(U, np.float32).copy()
    p = np.ascontiguousarray(p, np.float32)
    flags = np.ascontiguousarray(flags, np.int32)
    for bi in range(b):
        lib.velocity_update2d(
            _float_p(p[bi]), _float_p(out[bi]), _int_p(flags[bi]), h, w
        )
    return out


def set_wall_bcs(U, flags):
    lib = get_lib()
    b, h, w = flags.shape
    out = np.ascontiguousarray(U, np.float32).copy()
    flags = np.ascontiguousarray(flags, np.int32)
    for bi in range(b):
        lib.set_wall_bcs2d(_float_p(out[bi]), _int_p(flags[bi]), h, w)
    return out


def add_buoyancy(U, flags, density, gravity, rho_star, dt):
    lib = get_lib()
    b, h, w = flags.shape
    out = np.ascontiguousarray(U, np.float32).copy()
    g = np.ascontiguousarray(gravity, np.float32)
    density = np.ascontiguousarray(density, np.float32)
    flags = np.ascontiguousarray(flags, np.int32)
    for bi in range(b):
        lib.add_buoyancy2d(
            _float_p(out[bi]), _int_p(flags[bi]), _float_p(density[bi]),
            _float_p(g), ctypes.c_float(rho_star), ctypes.c_float(dt), h, w,
        )
    return out


def add_gravity(U, flags, gravity, dt):
    lib = get_lib()
    b, h, w = flags.shape
    out = np.ascontiguousarray(U, np.float32).copy()
    g = np.ascontiguousarray(gravity, np.float32)
    flags = np.ascontiguousarray(flags, np.int32)
    for bi in range(b):
        lib.add_gravity2d(
            _float_p(out[bi]), _int_p(flags[bi]), _float_p(g),
            ctypes.c_float(dt), h, w,
        )
    return out


def solve_jacobi(flags, div, iters):
    lib = get_lib()
    b, h, w = flags.shape
    p = np.zeros((b, h, w), np.float32)
    div = np.ascontiguousarray(div, np.float32)
    flags = np.ascontiguousarray(flags, np.int32)
    res = 0.0
    for bi in range(b):
        res = max(
            res,
            lib.solve_jacobi2d(
                _int_p(flags[bi]), _float_p(div[bi]), _float_p(p[bi]),
                iters, h, w,
            ),
        )
    return p, res


def advect_scalar(dt, src, U, flags, strength=0.75, sample_outside=False):
    """Straight-trace MacCormack scalar advection (line_trace=False)."""
    lib = get_lib()
    b, h, w = flags.shape
    out = np.zeros((b, h, w), np.float32)
    src = np.ascontiguousarray(src, np.float32)
    U = np.ascontiguousarray(U, np.float32)
    flags = np.ascontiguousarray(flags, np.int32)
    for bi in range(b):
        lib.advect_scalar2d(
            ctypes.c_float(dt), _float_p(src[bi]), _float_p(U[bi]),
            _int_p(flags[bi]), _float_p(out[bi]), ctypes.c_float(strength),
            ctypes.c_int32(1 if sample_outside else 0), h, w,
        )
    return out
