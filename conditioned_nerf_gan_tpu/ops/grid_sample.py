"""Trilinear feature-volume sampling (the `F.grid_sample` 5-D equivalent).

Parity target: `F.grid_sample(feature_volume, grid, mode="bilinear",
align_corners=False, padding_mode="border")` as used at reference
generators/siren.py:305-311 (and 10 more identical sites), plus the
`align_corners=True, padding_mode="zeros"` variant of `sample_from_3dgrid`
(siren.py:1328-1348).

TPU-first notes: volumes are stored channel-last (B, D, H, W, C) — NDHWC is
the native TPU conv/gather layout — and the 8-corner interpolation is
expressed as flat gathers over a (B, D*H*W, C) view so XLA emits a single
fused gather per corner. Coordinates follow the PyTorch grid convention:
last-dim (x, y, z) indexes (W, H, D) respectively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def trilinear_point_features(
    volume: jax.Array,
    coords: jax.Array,
    *,
    align_corners: bool = False,
    padding_mode: str = "border",
) -> jax.Array:
    """Sample per-point features from a dense 3-D feature volume.

    Args:
      volume: (B, D, H, W, C) channel-last feature volume
      coords: (B, N, 3) normalized coordinates in [-1, 1], PyTorch grid
              convention: coords[..., 0]=x→W, 1=y→H, 2=z→D
      align_corners / padding_mode: PyTorch-compatible ('border' | 'zeros')
    Returns:
      (B, N, C) trilinearly interpolated features.
    """
    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"Unsupported padding_mode {padding_mode!r}")
    B, D, H, W, C = volume.shape
    dtype = volume.dtype

    fx = _unnormalize(coords[..., 0].astype(dtype), W, align_corners)
    fy = _unnormalize(coords[..., 1].astype(dtype), H, align_corners)
    fz = _unnormalize(coords[..., 2].astype(dtype), D, align_corners)

    if padding_mode == "border":
        fx = jnp.clip(fx, 0.0, W - 1)
        fy = jnp.clip(fy, 0.0, H - 1)
        fz = jnp.clip(fz, 0.0, D - 1)

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    tx = fx - x0
    ty = fy - y0
    tz = fz - z0

    ix0 = x0.astype(jnp.int32)
    iy0 = y0.astype(jnp.int32)
    iz0 = z0.astype(jnp.int32)
    ix1 = ix0 + 1
    iy1 = iy0 + 1
    iz1 = iz0 + 1

    if padding_mode == "zeros":
        # Out-of-bounds corners contribute zero; track validity per corner.
        def corner_weight(ii, jj, kk, w):
            valid = (
                (ii >= 0) & (ii < W) & (jj >= 0) & (jj < H) & (kk >= 0) & (kk < D)
            )
            return jnp.where(valid, w, 0.0)
    else:
        def corner_weight(ii, jj, kk, w):
            return w

    vol_flat = volume.reshape(B, D * H * W, C)

    def gather(iz, iy, ix):
        izc = jnp.clip(iz, 0, D - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        ixc = jnp.clip(ix, 0, W - 1)
        flat = (izc * H + iyc) * W + ixc  # (B, N)
        return jnp.take_along_axis(vol_flat, flat[..., None], axis=1)  # (B, N, C)

    out = jnp.zeros((B, coords.shape[1], C), dtype=dtype)
    for dz, wz in ((iz0, 1.0 - tz), (iz1, tz)):
        for dy, wy in ((iy0, 1.0 - ty), (iy1, ty)):
            for dx, wx in ((ix0, 1.0 - tx), (ix1, tx)):
                w = corner_weight(dx, dy, dz, wx * wy * wz)
                out = out + gather(dz, dy, dx) * w[..., None]
    return out


def grid_sample_3d(
    volume_ncdhw: jax.Array,
    grid: jax.Array,
    *,
    align_corners: bool = False,
    padding_mode: str = "border",
) -> jax.Array:
    """PyTorch-layout convenience wrapper (for golden tests / porting).

    Args:
      volume_ncdhw: (B, C, D, H, W)
      grid: (B, Do, Ho, Wo, 3) with (x, y, z) in the last dim
    Returns (B, C, Do, Ho, Wo), matching `F.grid_sample` output layout.
    """
    B, C, D, H, W = volume_ncdhw.shape
    Do, Ho, Wo = grid.shape[1:4]
    volume = jnp.transpose(volume_ncdhw, (0, 2, 3, 4, 1))  # NDHWC
    coords = grid.reshape(B, Do * Ho * Wo, 3)
    feats = trilinear_point_features(
        volume, coords, align_corners=align_corners, padding_mode=padding_mode
    )  # (B, N, C)
    return jnp.transpose(feats, (0, 2, 1)).reshape(B, C, Do, Ho, Wo)
