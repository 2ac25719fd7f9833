"""Dense density-grid extraction from the conditioned SIREN.

Parity target: reference extract_shapes.py:15-78 — an N³ grid of sigma values
over a `cube_length` cube centered at the origin, evaluated in fixed-size
chunks. The grid axis order matches the reference's create_samples (sample
index decomposes as x-major / z-minor), so exported .mrc volumes orient
identically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def create_samples(n: int = 256, voxel_origin=(0, 0, 0), cube_length: float = 2.0):
    """(1, N³, 3) sample coordinates + (origin, voxel_size)."""
    origin = np.asarray(voxel_origin, np.float64) - cube_length / 2
    voxel_size = cube_length / (n - 1)
    idx = np.arange(n ** 3, dtype=np.int64)
    samples = np.empty((n ** 3, 3), np.float32)
    samples[:, 2] = idx % n
    samples[:, 1] = (idx // n) % n
    samples[:, 0] = (idx // (n * n)) % n
    samples[:, 0] = samples[:, 0] * voxel_size + origin[2]
    samples[:, 1] = samples[:, 1] * voxel_size + origin[1]
    samples[:, 2] = samples[:, 2] * voxel_size + origin[0]
    return samples[None], origin, voxel_size


def sample_sigma_grid(
    siren_apply,
    params,
    z,
    voxel_resolution: int = 256,
    voxel_origin=(0, 0, 0),
    cube_length: float = 1.2,
    max_points: int = 64 ** 3,
) -> np.ndarray:
    """(N, N, N) sigma grid, chunked at `max_points` points per eval."""
    samples, _, _ = create_samples(voxel_resolution, voxel_origin, cube_length)
    total = samples.shape[1]
    chunk = min(max_points, total)
    n_chunks = -(-total // chunk)
    pad_total = n_chunks * chunk

    padded = np.zeros((1, pad_total, 3), np.float32)
    padded[:, :total] = samples

    eval_chunk = jax.jit(
        lambda pts: siren_apply(params, pts, z)[..., -1]
    )
    sigmas = np.empty(pad_total, np.float32)
    for i in range(n_chunks):
        pts = jnp.asarray(padded[:, i * chunk : (i + 1) * chunk])
        sigmas[i * chunk : (i + 1) * chunk] = np.asarray(eval_chunk(pts))[0]
    return sigmas[:total].reshape(
        voxel_resolution, voxel_resolution, voxel_resolution
    )
