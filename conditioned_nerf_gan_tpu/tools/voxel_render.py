"""Nearest-neighbor voxel raycast renderer — the input-geometry baseline.

Parity target: reference feature_volume/voxel2img.py:24-101
(`voxel_interpolate` / `voxel_surface_render`): rays are sampled exactly like
the NeRF renderer, voxels are looked up with *nearest* interpolation, and each
pixel takes the color of the first sample whose occupancy is nonzero (white
background otherwise). Used to render "what the conditioning input alone looks
like" for comparison figures.

TPU-first: the reference finds first hits with a host-side
unique-first-index loop over torch.where results (voxel2img.py:42-52); here
it's a single argmax over the (static) sample axis.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..ops import get_initial_rays, transform_rays
from ..ops.grid_sample import trilinear_point_features

VOXEL_LENGTH = 1.2


def nearest_point_features(volume: jax.Array, coords: jax.Array) -> jax.Array:
    """Nearest-neighbor sampling (grid_sample mode='nearest', border pad).

    volume (B, D, H, W, C) NDHWC; coords (B, N, 3) in [-1, 1] (x,y,z)→(W,H,D).
    """
    B, D, H, W, C = volume.shape

    def unnorm(c, size):
        return jnp.clip(((c + 1.0) * size - 1.0) / 2.0, 0, size - 1)

    # round-half-away behavior of nearest resampling
    ix = jnp.round(unnorm(coords[..., 0], W)).astype(jnp.int32)
    iy = jnp.round(unnorm(coords[..., 1], H)).astype(jnp.int32)
    iz = jnp.round(unnorm(coords[..., 2], D)).astype(jnp.int32)
    flat = (iz * H + iy) * W + ix
    return jnp.take_along_axis(
        volume.reshape(B, D * H * W, C), flat[..., None], axis=1
    )


def voxel_surface_render(
    voxels: jax.Array,
    cam2worlds: jax.Array,
    img_size: int,
    fov: float,
    ray_start: float = 0.2,
    ray_end: float = 2.0,
    num_steps: int = 256,
) -> jax.Array:
    """Render (B, H, W, 3) first-hit voxel colors over a white background.

    voxels: (B, R, R, R, 4) NDHWC with channel 0 = occupancy, 1:4 = rgb
    (the on-disk voxel.npz layout, feature_volume/pcl2voxel.py:60-64).
    """
    B = cam2worlds.shape[0]
    pts, z_vals, dirs = get_initial_rays(
        B, num_steps, fov, (img_size, img_size), ray_start, ray_end
    )
    wpts, _, _, _ = transform_rays(pts, z_vals, dirs, cam2worlds)
    coords = wpts.reshape(B, -1, 3) / (VOXEL_LENGTH / 2.0)
    feats = nearest_point_features(voxels, coords)
    feats = feats.reshape(B, img_size * img_size, num_steps, 4)

    occupied = feats[..., 0] != 0  # (B, R, S)
    first_hit = jnp.argmax(occupied, axis=-1)  # first True along the ray
    any_hit = occupied.any(axis=-1)
    hit_rgb = jnp.take_along_axis(
        feats[..., 1:4], first_hit[..., None, None], axis=-2
    )[..., 0, :]
    rgb = jnp.where(any_hit[..., None], hit_rgb, 1.0)
    return rgb.reshape(B, img_size, img_size, 3)


def main(argv=None):
    from ..data import ShapeNetDataset, DataLoader
    from ..utils.image import to_uint8

    parser = argparse.ArgumentParser(description="Voxel baseline renderer")
    parser.add_argument("--dataset_path", required=True)
    parser.add_argument("--subset", default="val")
    parser.add_argument("--out_dir", required=True)
    parser.add_argument("--img_size", type=int, default=128)
    parser.add_argument("--voxel_resolution", type=int, default=32)
    parser.add_argument("--fov", type=float, default=49.134342641202636)
    parser.add_argument("--ray_start", type=float, default=0.2)
    parser.add_argument("--ray_end", type=float, default=2.0)
    parser.add_argument("--num_steps", type=int, default=256)
    args = parser.parse_args(argv)

    import cv2

    meta = {"num_points_ratio": 1.0, "dataset": {}}
    dataset = ShapeNetDataset(
        args.dataset_path, args.img_size, args.subset, meta,
        load_voxel=True, load_pcl=False, dataset_mode="test",
        load_img=False, load_depth=False, load_cam=True, shuffle=False,
        voxel_resolution=args.voxel_resolution,
    )
    loader = DataLoader(dataset, 1, shuffle=False, drop_last=False)
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    render = jax.jit(
        lambda v, c: voxel_surface_render(
            v, c, args.img_size, args.fov, args.ray_start, args.ray_end,
            args.num_steps,
        )
    )
    for batch in loader:
        rgb = np.asarray(render(jnp.asarray(batch["voxel"]),
                                jnp.asarray(batch["cam2world"])))
        for idx, img in enumerate(rgb):
            p = Path(batch["img_path"][idx])
            name = f"{p.parent.parent.stem}_{p.name}"
            cv2.imwrite(str(out_dir / name), to_uint8(img)[..., ::-1])
    print("Wrote voxel baseline renders to", out_dir)


if __name__ == "__main__":
    main()
