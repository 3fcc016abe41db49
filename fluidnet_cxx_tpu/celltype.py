"""Manta/FluidNet cell-type flags.

Same integer convention as the reference (ref: pytorch/lib/fluid/cell_type.py:5-14,
pytorch/lib/fluid/cpp/cell_type.h:7-18) so Mantaflow datasets load unchanged.
Flags are stored as int32 arrays in this framework (the reference stores them as
float tensors; we convert at the I/O boundary).
"""
from enum import IntEnum


class CellType(IntEnum):
    TypeNone = 0
    TypeFluid = 1
    TypeObstacle = 2
    TypeEmpty = 4
    TypeInflow = 8
    TypeOutflow = 16
    TypeOpen = 32
    TypeStick = 128
    TypeReserved = 256
    # Internal use (original FluidNet convention).
    TypeZeroPressure = 1 << 15


FLUID = int(CellType.TypeFluid)
OBSTACLE = int(CellType.TypeObstacle)
EMPTY = int(CellType.TypeEmpty)
INFLOW = int(CellType.TypeInflow)
OUTFLOW = int(CellType.TypeOutflow)
STICK = int(CellType.TypeStick)
