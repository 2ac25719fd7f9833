"""Minimal OpenEXR scanline reader (no external OpenEXR dependency).

Supports the subset Blender's depth passes use: single-part scanline files,
HALF/FLOAT channels, NONE/RLE/ZIPS/ZIP compression. `read_exr_depth` replicates
the reference's `readEXR` semantics (reference datasets.py:183-216): take the
R channel, map the half-float max 65504 to inf, resize, then zero out inf
(background) pixels.
"""

from __future__ import annotations

import struct
import zlib
from pathlib import Path

import numpy as np

_MAGIC = 20000630
_PIXEL_DTYPES = {0: np.uint32, 1: np.float16, 2: np.float32}
_COMPRESSION_SCANLINES = {0: 1, 1: 1, 2: 1, 3: 16}  # NONE, RLE, ZIPS, ZIP


def _read_null_string(buf: memoryview, pos: int) -> tuple[str, int]:
    end = pos
    while buf[end] != 0:
        end += 1
    return bytes(buf[pos:end]).decode("latin-1"), end + 1


def _unpredict_and_interleave(data: bytes) -> bytes:
    """Undo the EXR zip predictor + byte-plane split."""
    arr = np.frombuffer(data, dtype=np.uint8)
    # predictor: arr[i] += arr[i-1] - 128 (mod 256), sequential — vectorized
    # as a cumulative sum of (arr - 128) offsets.
    deltas = arr.astype(np.int64)
    deltas[1:] -= 128
    out = np.cumsum(deltas) % 256
    arr = out.astype(np.uint8)
    half = (len(arr) + 1) // 2
    inter = np.empty(len(arr), dtype=np.uint8)
    inter[0::2] = arr[:half]
    inter[1::2] = arr[half : half + len(arr) - half]
    return inter.tobytes()


def _rle_decompress(data: bytes) -> bytes:
    """OpenEXR RLE scheme: a signed count byte per run — negative means
    -count literal bytes follow, non-negative means count+1 copies of the
    next byte. The output then goes through the same predictor/interleave
    postprocess as zip."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        count = data[i]
        i += 1
        if count > 127:  # signed < 0: literal run
            run = 256 - count
            if i + run > n:
                raise ValueError(
                    f"corrupt RLE chunk: literal run of {run} bytes extends "
                    f"past the {n}-byte buffer"
                )
            out += data[i : i + run]
            i += run
        else:
            if i >= n:
                raise ValueError(
                    "corrupt RLE chunk: repeat run missing its value byte"
                )
            out += data[i : i + 1] * (count + 1)
            i += 1
    return bytes(out)


def read_exr(path: str | Path) -> dict[str, np.ndarray]:
    """Parse an EXR file into {channel_name: (H, W) float32 array}."""
    raw = Path(path).read_bytes()
    buf = memoryview(raw)
    magic, version = struct.unpack_from("<ii", buf, 0)
    if magic != _MAGIC:
        raise ValueError(f"{path}: not an EXR file")
    if version & 0x200:
        raise ValueError(f"{path}: tiled EXR not supported")
    pos = 8

    channels: list[tuple[str, int]] = []
    data_window = None
    compression = 0
    while True:
        name, pos = _read_null_string(buf, pos)
        if not name:
            break
        attr_type, pos = _read_null_string(buf, pos)
        (size,) = struct.unpack_from("<i", buf, pos)
        pos += 4
        payload = buf[pos : pos + size]
        pos += size
        if name == "channels":
            cpos = 0
            while payload[cpos] != 0:
                cname, cpos = _read_null_string(payload, cpos)
                (ptype,) = struct.unpack_from("<i", payload, cpos)
                cpos += 16  # type + pLinear/reserved + xSampling + ySampling
                channels.append((cname, ptype))
        elif name == "dataWindow":
            data_window = struct.unpack_from("<4i", payload, 0)
        elif name == "compression":
            compression = payload[0]

    if data_window is None:
        raise ValueError(f"{path}: missing dataWindow")
    if compression not in _COMPRESSION_SCANLINES:
        raise ValueError(f"{path}: unsupported compression {compression}")

    x_min, y_min, x_max, y_max = data_window
    width = x_max - x_min + 1
    height = y_max - y_min + 1
    channels.sort(key=lambda c: c[0])  # EXR stores channels alphabetically
    lines_per_chunk = _COMPRESSION_SCANLINES[compression]
    n_chunks = (height + lines_per_chunk - 1) // lines_per_chunk

    # scanline offset table
    pos += 8 * n_chunks

    out = {
        cname: np.empty((height, width), dtype=np.float32)
        for cname, _ in channels
    }
    for _ in range(n_chunks):
        y, nbytes = struct.unpack_from("<ii", buf, pos)
        pos += 8
        chunk = bytes(buf[pos : pos + nbytes])
        pos += nbytes
        n_lines = min(lines_per_chunk, y_max - y + 1)
        row_bytes = sum(
            width * np.dtype(_PIXEL_DTYPES[t]).itemsize for _, t in channels
        )
        expected = row_bytes * n_lines
        if compression in (2, 3) and nbytes < expected:
            chunk = _unpredict_and_interleave(zlib.decompress(chunk))
        elif compression == 1 and nbytes < expected:
            chunk = _unpredict_and_interleave(_rle_decompress(chunk))
        if len(chunk) != expected:
            raise ValueError(
                f"{path}: chunk at scanline {y} decoded to {len(chunk)} "
                f"bytes, expected {expected} — corrupt or truncated file"
            )
        cpos = 0
        for line in range(n_lines):
            for cname, ptype in channels:
                dtype = _PIXEL_DTYPES[ptype]
                nb = width * np.dtype(dtype).itemsize
                vals = np.frombuffer(chunk, dtype=dtype, count=width, offset=cpos)
                out[cname][y - y_min + line] = vals.astype(np.float32)
                cpos += nb
    return out


def read_exr_depth(path: str | Path, img_size: int | None = None) -> np.ndarray:
    """Depth map with the reference's background convention (datasets.py:183-216)."""
    import cv2

    chans = read_exr(path)
    key = "R" if "R" in chans else next(iter(chans))
    depth = chans[key].astype(np.float64)
    depth[depth == 65504] = np.inf
    if img_size is not None and img_size != depth.shape[0]:
        mode = cv2.INTER_LINEAR if img_size > depth.shape[0] else cv2.INTER_AREA
        depth = cv2.resize(depth, dsize=(img_size, img_size), interpolation=mode)
    # zero ALL non-finite values, not just +inf: bilinear UPSCALE across the
    # inf background produces NaN (inf - inf inside cv2's lerp), which the
    # reference's `depth[depth == np.inf] = 0` (datasets.py:215) would leak
    # into the depth loss — latent there (it never upscales), fixed here.
    depth[~np.isfinite(depth)] = 0
    return depth
