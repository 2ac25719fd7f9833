"""Minimal MRC-2014 volume writer (mode 2, float32).

Replaces the reference's `mrcfile.new_mmap` usage (reference
inference.py:377-384) without the mrcfile dependency; output opens in
ChimeraX / mrcfile readers.
"""

from __future__ import annotations

import struct
from pathlib import Path

import numpy as np


def write_mrc(path: str | Path, volume: np.ndarray, voxel_size: float = 1.0) -> None:
    """Write a 3-D float32 volume as an MRC file."""
    volume = np.ascontiguousarray(volume, np.float32)
    nz, ny, nx = volume.shape
    header = bytearray(1024)
    struct.pack_into("<3i", header, 0, nx, ny, nz)          # NX NY NZ
    struct.pack_into("<i", header, 12, 2)                   # MODE 2 = float32
    struct.pack_into("<3i", header, 28, nx, ny, nz)         # MX MY MZ
    struct.pack_into(
        "<3f", header, 40, nx * voxel_size, ny * voxel_size, nz * voxel_size
    )                                                       # CELLA
    struct.pack_into("<3f", header, 52, 90.0, 90.0, 90.0)   # CELLB
    struct.pack_into("<3i", header, 64, 1, 2, 3)            # MAPC MAPR MAPS
    struct.pack_into(
        "<3f", header, 76,
        float(volume.min()), float(volume.max()), float(volume.mean()),
    )                                                       # DMIN DMAX DMEAN
    header[208:212] = b"MAP "                               # MAP stamp
    header[212:216] = b"\x44\x44\x00\x00"                   # little-endian stamp
    with open(path, "wb") as f:
        f.write(bytes(header))
        f.write(volume.tobytes())
