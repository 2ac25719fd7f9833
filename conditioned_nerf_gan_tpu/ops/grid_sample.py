"""Trilinear feature-volume sampling (the `F.grid_sample` 5-D equivalent).

Parity target: `F.grid_sample(feature_volume, grid, mode="bilinear",
align_corners=False, padding_mode="border")` as used at reference
generators/siren.py:305-311 (and 10 more identical sites), plus the
`align_corners=True, padding_mode="zeros"` variant of `sample_from_3dgrid`
(siren.py:1328-1348).

TPU-first notes: volumes are stored channel-last (B, D, H, W, C) — NDHWC is
the native TPU conv/gather layout. TPU gathers are latency-bound per index
and per *discontiguous segment*, not bandwidth-bound: measured on v5e-1 at
1.57M points from a 64³×32ch volume —
    8 per-corner row gathers          154 ms   (the torch-translation shape)
    1 gather of (2,2,2,C) blocks       77 ms   (4 segments/point)
    1 gather, (z,y)-neighbors in C     62 ms   (1 segment/point — ceiling)
Beyond one segment the engine floors at ~40 ns/point, so the border-mode hot
path uses the neighbor-expanded layout for volumes that fit the 4× transient
memory and the block gather above that; the zeros-mode (used only by the
legacy `sample_from_3dgrid` variant) keeps the per-corner masked
formulation. Coordinates follow the PyTorch grid convention: last-dim
(x, y, z) indexes (W, H, D) respectively.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


# Volumes up to this many elements use the neighbor-expanded layout (4×
# memory, single-segment gathers); larger ones use (2,2,2,C) block gathers.
# Batch-total volume elements (B·D·H·W·C) up to which the expanded-copy
# gather strategy is used; its 4C expansion costs 16 bytes/elem per live
# copy, so 80M elems ≈ 1.3 GB — the measured-fast strategy at the thesis
# FG shapes (B=8, 64³×32 = 67M) while big-batch voxel configs (B≥12) fall
# back to the copy-free block gather and fit 16 GB HBM.
_EXPAND_MAX_ELEMS = 80 * 1024 * 1024


def _anchor_fractions(fx, fy, fz, D, H, W):
    """Clamped block anchors (≤ size-2) + fractions in [0, 1] (border mode)."""
    fx = jnp.clip(fx, 0.0, W - 1)
    fy = jnp.clip(fy, 0.0, H - 1)
    fz = jnp.clip(fz, 0.0, D - 1)
    ix = jnp.minimum(jnp.floor(fx).astype(jnp.int32), W - 2)
    iy = jnp.minimum(jnp.floor(fy).astype(jnp.int32), H - 2)
    iz = jnp.minimum(jnp.floor(fz).astype(jnp.int32), D - 2)
    return ix, iy, iz, (fx - ix)[..., None], (fy - iy)[..., None], (fz - iz)[..., None]


def _gather_blocks(volume: jax.Array, ix, iy, iz) -> jax.Array:
    """Fetch each point's 2×2×2 corner block in one contiguous gather.

    The (z, y) neighbors are replicated into channels —
    V4[z, y, x] = [V[z,y,x] | V[z,y+1,x] | V[z+1,y,x] | V[z+1,y+1,x]] —
    so the block is the contiguous (2, 4C) row pair (x, x+1): one gather
    segment per point instead of four. Measured (v5e-1, 1.57M pts,
    64³×32ch): 62.5 ms vs 77 ms block-gather vs 154 ms per-corner rows —
    beyond one segment the gather engine is latency-bound at ~40 ns/point
    (an x-replicated single-row 8C variant measures the same), so this is
    the XLA ceiling. Costs 4× transient volume memory (shifted concats,
    ~0.5 ms for 64³×32).

    Returns blk (B, N, 2, 4, C): axis 2 = x corner, axis 3 = the zy corner
    in order (z0y0, z0y1, z1y0, z1y1).
    """
    B, D, H, W, C = volume.shape
    y_next = jnp.concatenate([volume[:, :, 1:], volume[:, :, -1:]], axis=2)
    z_next = jnp.concatenate([volume[:, 1:], volume[:, -1:]], axis=1)
    zy_next = jnp.concatenate([y_next[:, 1:], y_next[:, -1:]], axis=1)
    v4 = jnp.concatenate([volume, y_next, z_next, zy_next], axis=-1)
    starts = jnp.stack([iz, iy, ix], axis=-1)  # (B, N, 3)

    def per_b(vol_b, starts_b):
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )
        return lax.gather(
            vol_b, starts_b, dnums, slice_sizes=(1, 1, 2, 4 * C),
            mode=lax.GatherScatterMode.CLIP,
        )

    blk = jax.vmap(per_b)(v4, starts)  # (B, N, 1, 1, 2, 4C)
    return blk.reshape(B, blk.shape[1], 2, 4, C)


def _lerp_blocks(blk, tx, ty, tz):
    gx = blk[:, :, 0] * (1 - tx[..., None]) + blk[:, :, 1] * tx[..., None]
    gz0 = gx[:, :, 0] * (1 - ty) + gx[:, :, 1] * ty
    gz1 = gx[:, :, 2] * (1 - ty) + gx[:, :, 3] * ty
    return gz0 * (1 - tz) + gz1 * tz


@jax.custom_vjp
def _border_trilerp(volume: jax.Array, fx, fy, fz) -> jax.Array:
    """Border-mode trilerp (both gather strategies, matmul-transpose VJP).

    Custom VJP: XLA's native backward for the gather is a scatter-add into
    the volume — measured 8.4 s per 1.57M points on v5e-1 (~5 µs/point; TPUs
    have no atomic scatter, so colliding updates serialize). The backward
    here instead computes dV = Pᵀ·Q as dense one-hot-weighted *matmuls*
    (MXU work, 2·N·D·H·W·C FLOPs ≈ 26 TFLOP at the 64³ stage shape — ~0.3 s
    at bf16), with the one-hots factored as (z,y) rows × (x,channel)
    columns and accumulated over point chunks in a scan.
    """
    B, D, H, W, C = volume.shape
    ix, iy, iz, tx, ty, tz = _anchor_fractions(fx, fy, fz, D, H, W)
    return _lerp_blocks(_blocks_for(volume, ix, iy, iz), tx, ty, tz)


def _expanded_fwd(volume, fx, fy, fz):
    return _border_trilerp(volume, fx, fy, fz), (volume, fx, fy, fz)


# points per transpose-matmul chunk (bounds P/Q size); swept 4k-32k on
# v5e-1 at the 64³ stage shape: 233/210/201/204 ms — 16k is the flattest
_DVOL_CHUNK = 16384


def _expanded_bwd(res, g):
    volume, fx, fy, fz = res
    B, D, H, W, C = volume.shape
    N = fx.shape[1]
    ix, iy, iz, tx, ty, tz = _anchor_fractions(fx, fy, fz, D, H, W)

    # ---- coordinate cotangents (re-gather the blocks; ~70 ms ≪ matmul) ---
    blk = _blocks_for(volume, ix, iy, iz)  # (B, N, 2, 4, C)
    u = jnp.concatenate(
        [(1 - ty) * (1 - tz), ty * (1 - tz), (1 - ty) * tz, ty * tz], axis=-1
    )  # (B, N, 4)
    diff_x = blk[:, :, 1] - blk[:, :, 0]  # (B, N, 4, C)
    d_tx = jnp.einsum("bnkc,bnk,bnc->bn", diff_x, u, g)
    gx = blk[:, :, 0] * (1 - tx[..., None]) + blk[:, :, 1] * tx[..., None]
    d_ty = jnp.einsum(
        "bnc,bnc->bn", g,
        (1 - tz) * (gx[:, :, 1] - gx[:, :, 0]) + tz * (gx[:, :, 3] - gx[:, :, 2]),
    )
    d_tz = jnp.einsum(
        "bnc,bnc->bn", g,
        (gx[:, :, 2] * (1 - ty) + gx[:, :, 3] * ty)
        - (gx[:, :, 0] * (1 - ty) + gx[:, :, 1] * ty),
    )
    # clip passthrough (jnp.clip's VJP: gradient inside the inclusive range)
    d_fx = jnp.where((fx >= 0) & (fx <= W - 1), d_tx, 0.0)
    d_fy = jnp.where((fy >= 0) & (fy <= H - 1), d_ty, 0.0)
    d_fz = jnp.where((fz >= 0) & (fz <= D - 1), d_tz, 0.0)

    # ---- volume cotangent: dV = Pᵀ Q over point chunks -------------------
    # P (n, D·H): 4 one-hot rows at (iz+a)·H + iy+b weighted u_ab
    # Q (n, W·C): 2 one-hot column groups at x = ix+a weighted wx_a ⊙ g
    n_pad = -N % _DVOL_CHUNK
    def pad(x, value=0):
        cfgs = [(0, 0)] * x.ndim
        cfgs[1] = (0, n_pad)
        return jnp.pad(x, cfgs, constant_values=value) if n_pad else x

    zy_base = (iz * H + iy).astype(jnp.int32)
    ops = dict(
        zy=pad(zy_base), x0=pad(ix), u=pad(u), tx=pad(tx[..., 0]),
        g=pad(g),  # padded g rows are zero → contribute nothing
    )
    n_chunks = (N + n_pad) // _DVOL_CHUNK
    ops = {k: v.reshape(B, n_chunks, _DVOL_CHUNK, *v.shape[2:]).swapaxes(0, 1)
           for k, v in ops.items()}

    iota_zy = jnp.arange(D * H, dtype=jnp.int32)
    iota_x = jnp.arange(W, dtype=jnp.int32)
    mm_dtype = jnp.bfloat16

    def chunk_body(acc, op):
        zy, x0, uu, txc, gg = op["zy"], op["x0"], op["u"], op["tx"], op["g"]
        # P: (B, n, DH)
        p = (
            (zy[..., None] == iota_zy) * uu[..., 0:1]
            + ((zy + 1)[..., None] == iota_zy) * uu[..., 1:2]
            + ((zy + H)[..., None] == iota_zy) * uu[..., 2:3]
            + ((zy + H + 1)[..., None] == iota_zy) * uu[..., 3:4]
        ).astype(mm_dtype)
        # Q: (B, n, W, C)
        oh0 = (x0[..., None] == iota_x).astype(mm_dtype)
        oh1 = ((x0 + 1)[..., None] == iota_x).astype(mm_dtype)
        q = (
            oh0[..., None] * ((1 - txc)[..., None] * gg)[:, :, None, :]
            + oh1[..., None] * (txc[..., None] * gg)[:, :, None, :]
        ).astype(mm_dtype)
        q = q.reshape(*q.shape[:2], W * C)
        acc = acc + jnp.einsum(
            "bnp,bnq->bpq", p, q, preferred_element_type=jnp.float32
        )
        return acc, None

    acc0 = jnp.zeros((B, D * H, W * C), jnp.float32)
    d_vol, _ = lax.scan(chunk_body, acc0, ops)
    d_vol = d_vol.reshape(B, D, H, W, C).astype(volume.dtype)
    return d_vol, d_fx, d_fy, d_fz


_border_trilerp.defvjp(_expanded_fwd, _expanded_bwd)


def _block_gather_blocks(volume: jax.Array, ix, iy, iz) -> jax.Array:
    """(2,2,2,C)-block gather per point → canonical (B, N, 2x, 4zy, C).

    Four segments per point (the z/y strides are discontiguous) — slower
    than _gather_blocks but needs no 4× expanded copy; used for volumes
    above _EXPAND_MAX_ELEMS.
    """
    B, D, H, W, C = volume.shape
    starts = jnp.stack([iz, iy, ix], axis=-1)  # (B, N, 3)

    def per_b(vol_b, starts_b):
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4), collapsed_slice_dims=(),
            start_index_map=(0, 1, 2),
        )
        return lax.gather(
            vol_b, starts_b, dnums, slice_sizes=(2, 2, 2, C),
            mode=lax.GatherScatterMode.CLIP,
        )

    blk = jax.vmap(per_b)(volume, starts)  # (B, N, 2z, 2y, 2x, C)
    B2, N2 = blk.shape[:2]
    return blk.transpose(0, 1, 4, 2, 3, 5).reshape(B2, N2, 2, 4, C)


def _blocks_for(volume, ix, iy, iz):
    """Pick the gather strategy by the *batch-total* expanded size.

    The expanded strategy materializes a 4C-channel copy of the whole batch
    of volumes (and XLA keeps several alive across coarse/fine evals), so
    the memory heuristic must include B: at the reference dg stage-0 shape
    (B=24, 64³×32ch) the expansion is 3 GB per live copy and OOMs a 16 GB
    chip, while the 4-segment block gather needs no copy and is only ~25%
    slower per point.
    """
    B, D, H, W, C = volume.shape
    if B * D * H * W * C <= _EXPAND_MAX_ELEMS:
        return _gather_blocks(volume, ix, iy, iz)
    return _block_gather_blocks(volume, ix, iy, iz)


def _block_gather_border(volume: jax.Array, fx, fy, fz) -> jax.Array:
    """Border-mode trilerp via one (2,2,2,C)-block gather per point.

    Border clamping folds into the block form: with fx clipped to [0, W-1]
    and the block anchor ix = min(floor(fx), W-2), the fraction
    tx = fx - ix ∈ [0, 1] reproduces the torch result exactly — at the high
    border (fx = W-1) the anchor shifts down one cell and tx = 1 selects the
    border voxel, identical to torch's clipped x1 with tx = 0.
    """
    B, D, H, W, C = volume.shape
    ix, iy, iz, tx, ty, tz = _anchor_fractions(fx, fy, fz, D, H, W)
    return _lerp_blocks(_block_gather_blocks(volume, ix, iy, iz), tx, ty, tz)


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
        if min(D, H, W) >= 2:
            # custom-vjp trilerp: strategy chosen by size inside; the
            # backward is always the matmul transpose (never XLA scatter)
            return _border_trilerp(volume, fx, fy, fz)
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
