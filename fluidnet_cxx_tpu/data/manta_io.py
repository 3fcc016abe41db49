"""Mantaflow .bin snapshot I/O.

File format (ref: pytorch/lib/load_manta_data.py:4-41): 5 int32 header
(transpose, nx, ny, nz, is3D), then float32 Ux, Uy [, Uz], p blobs, an int32
flags blob and a float32 density blob, each nx*ny*nz elements.

Reads into the framework layout (scalars (h, w), velocity (2, h, w)) for 2-D
files. A C++ fast path (native/) is used automatically for bulk preprocessing
when built.
"""
import struct

import numpy as np


def load_manta_file(path: str, use_native: bool = True):
    """Returns (p, U, flags, density, is3d) as numpy arrays without the batch
    dim: p/flags/density (nz, ny, nx) squeezed to (ny, nx) in 2-D, U
    (2|3, ny, nx). Uses the C++ parser (native/) for 2-D files when built."""
    if use_native:
        from .. import native

        out = native.load_manta_bin2d(path)
        if out is not None:
            p, U, flags, density = out
            return p, U, flags, density, False
        out = native.load_manta_bin3d(path)
        if out is not None:
            p, U, flags, density = out
            return p, U, flags, density, True
    with open(path, "rb") as f:
        head = struct.unpack("i" * 5, f.read(20))
        _, nx, ny, nz, is3d_i = head
        is3d = is3d_i == 1
        numel = nx * ny * nz

        main = np.frombuffer(f.read(4 * 3 * numel), dtype=np.float32)
        ux = main[:numel].reshape(nz, ny, nx)
        uy = main[numel: 2 * numel].reshape(nz, ny, nx)
        p = main[2 * numel:].reshape(nz, ny, nx)
        if is3d:
            uz = np.frombuffer(
                f.read(4 * numel), dtype=np.float32
            ).reshape(nz, ny, nx)
        flags = np.frombuffer(f.read(4 * numel), dtype=np.int32).reshape(
            nz, ny, nx
        )
        density = np.frombuffer(
            f.read(4 * numel), dtype=np.float32
        ).reshape(nz, ny, nx)

    if is3d:
        U = np.stack([ux, uy, uz])
        return p, U, flags, density, True
    return (
        p[0],
        np.stack([ux[0], uy[0]]),
        flags[0],
        density[0],
        False,
    )


def save_manta_file(path: str, p, U, flags, density):
    """Write a 2-D snapshot in the Manta .bin layout (round-trip testable)."""
    h, w = p.shape
    with open(path, "wb") as f:
        f.write(struct.pack("i" * 5, 0, w, h, 1, 0))
        f.write(np.asarray(U[0], np.float32).tobytes())
        f.write(np.asarray(U[1], np.float32).tobytes())
        f.write(np.asarray(p, np.float32).tobytes())
        f.write(np.asarray(flags, np.int32).tobytes())
        f.write(np.asarray(density, np.float32).tobytes())


def save_manta_file3d(path: str, p, U, flags, density):
    """Write a 3-D snapshot in the Manta .bin layout: header then Ux, Uy, p,
    Uz, flags, density (Uz comes AFTER p for is3D files,
    ref: pytorch/lib/load_manta_data.py:16-24)."""
    d, h, w = p.shape
    with open(path, "wb") as f:
        f.write(struct.pack("i" * 5, 0, w, h, d, 1))
        f.write(np.asarray(U[0], np.float32).tobytes())
        f.write(np.asarray(U[1], np.float32).tobytes())
        f.write(np.asarray(p, np.float32).tobytes())
        f.write(np.asarray(U[2], np.float32).tobytes())
        f.write(np.asarray(flags, np.int32).tobytes())
        f.write(np.asarray(density, np.float32).tobytes())
