#!/usr/bin/env python3
"""Generate golden Manta .bin fixtures for tests/fixtures/.

Written deliberately WITHOUT fluidnet_cxx_tpu's own writer (value-by-value
struct.pack, following the byte layout the reference reader decodes,
ref: pytorch/lib/load_manta_data.py:4-41) so the fixtures are an independent
authority on the format: header (transpose, nx, ny, nz, is3D) int32, then
float32 Ux, Uy, p [, Uz if 3-D] blobs, int32 flags, float32 density, each
nx*ny*nz elements, x fastest.

Cell values are deterministic functions of (k, j, i) so tests can verify
placement analytically: Ux=idx, Uy=1e4+idx, Uz=2e4+idx, p=3e4+idx,
flags=1+(idx%3), density=4e4+idx, idx = (k*ny + j)*nx + i.
"""
import os
import struct


def write(path, nx, ny, nz, is3d):
    n = nx * ny * nz
    with open(path, "wb") as f:
        f.write(struct.pack("iiiii", 0, nx, ny, nz, int(is3d)))
        for base in (0.0, 1e4):  # Ux, Uy
            for idx in range(n):
                f.write(struct.pack("f", base + idx))
        for idx in range(n):  # p
            f.write(struct.pack("f", 3e4 + idx))
        if is3d:
            for idx in range(n):  # Uz (after p!)
                f.write(struct.pack("f", 2e4 + idx))
        for idx in range(n):  # flags
            f.write(struct.pack("i", 1 + idx % 3))
        for idx in range(n):  # density
            f.write(struct.pack("f", 4e4 + idx))
    print(f"wrote {path} ({os.path.getsize(path)} bytes)")


if __name__ == "__main__":
    here = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    os.makedirs(here, exist_ok=True)
    write(os.path.join(here, "golden_2d_5x4.bin"), 4, 5, 1, False)
    write(os.path.join(here, "golden_3d_4x3x2.bin"), 2, 3, 4, True)
