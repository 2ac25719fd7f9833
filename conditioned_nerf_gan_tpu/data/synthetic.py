"""Synthetic ShapeNet-format fixture data.

Generates a tiny dataset in the exact on-disk layout the reference's Blender
pipeline produces (reference blender_renderer/render_blender.py:1-18,
feature_volume/pcl2voxel.py:23-77):

    {root}/{car}/image/{i:04}.png        16-bit RGBA renders
    {root}/{car}/depth/{i:04}.npy        z-depth maps (EXR stand-in)
    {root}/{car}/cameras.npz             world_mat_{i} / world_mat_inv_{i} / camera_mat_{i}
    {root}/{car}/pcl_color.npy           (N, 6) colored surface point cloud
    {root}/{car}/voxel.npz, voxel_32.npz (X, Y, Z, 4) occupancy+RGB grids
    {root_parent}/{mode}.lst             split lists (twenty/thousand/single/val)

Each "car" is a randomized colored box compound; views are rendered
analytically with the framework's own volume renderer, so an encoder+NeRF can
genuinely learn the distribution (used by the CPU smoke train config and the
test suite). Blender itself is intentionally not a dependency.
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np


def _make_car(rng: np.ndarray, n_boxes: int = 3):
    """Random compound of colored axis-aligned boxes inside the ±0.35 cube."""
    boxes = []
    for _ in range(n_boxes):
        center = rng.uniform(-0.2, 0.2, 3)
        half = rng.uniform(0.06, 0.18, 3)
        color = rng.uniform(0.1, 1.0, 3)
        boxes.append((center, half, color))
    return boxes


def _voxelize(boxes, resolution: int) -> np.ndarray:
    """Rasterize boxes into an (X, Y, Z, 4) grid in the 1.2³ cube.

    Channel layout matches the reference pcl2voxel output
    (feature_volume/pcl2voxel.py:60-64): channel 0 = occupancy, 1:4 = rgb.
    """
    coords = (np.arange(resolution) + 0.5) / resolution * 1.2 - 0.6
    gx, gy, gz = np.meshgrid(coords, coords, coords, indexing="ij")
    vox = np.zeros((resolution, resolution, resolution, 4), dtype=np.float32)
    for center, half, color in boxes:
        inside = (
            (np.abs(gx - center[0]) < half[0])
            & (np.abs(gy - center[1]) < half[1])
            & (np.abs(gz - center[2]) < half[2])
        )
        vox[inside, 0] = 1.0
        vox[inside, 1:4] = color
    return vox


def _surface_pcl(boxes, n_points: int, rng) -> np.ndarray:
    """Sample colored points on box surfaces → (N, 6) [xyz, rgb]."""
    pts = []
    per_box = n_points // len(boxes) + 1
    for center, half, color in boxes:
        face = rng.integers(0, 6, per_box)
        u = rng.uniform(-1, 1, (per_box, 3))
        axis = face // 2
        sign = np.where(face % 2 == 0, 1.0, -1.0)
        u[np.arange(per_box), axis] = sign
        xyz = center + u * half
        rgb = np.tile(color, (per_box, 1))
        pts.append(np.concatenate([xyz, rgb], axis=1))
    out = np.concatenate(pts)[:n_points].astype(np.float32)
    return out


def _render_views(vox, cam2worlds, img_size, fov, ray_start, ray_end, num_steps=64):
    """Render box-voxel scenes with the framework's own volume renderer."""
    import jax
    import jax.numpy as jnp

    from ..ops import (
        get_initial_rays,
        transform_rays,
        volume_integrate,
        distance2depth,
        trilinear_point_features,
    )

    B = cam2worlds.shape[0]
    vol = jnp.asarray(vox.transpose(2, 1, 0, 3))[None]  # (1, z, y, x, 4) NDHWC
    vol = jnp.broadcast_to(vol, (B, *vol.shape[1:]))

    @jax.jit
    def render(cams):
        pts, z_vals, dirs = get_initial_rays(
            B, num_steps, fov, (img_size, img_size), ray_start, ray_end
        )
        wpts, z_vals, _, _ = transform_rays(pts, z_vals, dirs, cams)
        flat = wpts.reshape(B, -1, 3) / 0.6
        feats = trilinear_point_features(vol, flat, padding_mode="zeros")
        feats = feats.reshape(B, img_size * img_size, num_steps, 4)
        rgb = feats[..., 1:4]
        sigma = jnp.where(feats[..., 0:1] > 0.5, 800.0, -800.0)
        pix, dist, _ = volume_integrate(
            jnp.concatenate([rgb, sigma], -1), z_vals,
            clamp_mode="relu", white_back=True,
        )
        depth = distance2depth(dist, dirs)
        return (
            pix.reshape(B, img_size, img_size, 3),
            depth.reshape(B, img_size, img_size),
        )

    pix, depth = render(jnp.asarray(cam2worlds))
    return np.asarray(pix), np.asarray(depth)


def make_synthetic_shapenet(
    root: str | Path,
    n_cars: int = 8,
    n_views: int = 12,
    img_size: int = 64,
    n_points: int = 2048,
    voxel_resolutions=(64, 32),
    fov: float = 49.134342641202636,
    ray_start: float = 0.25,
    ray_end: float = 1.95,
    cam_r: float = 1.1,
    seed: int = 0,
) -> Path:
    """Write a synthetic dataset; returns the dataset root (…/ShapeNetCar)."""
    import cv2

    from ..ops import create_cam2world_matrix
    import jax.numpy as jnp

    root = Path(root)
    dataset_root = root / "ShapeNetCar"
    dataset_root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    car_ids = [f"car{idx:04d}" for idx in range(n_cars)]

    for car_id in car_ids:
        car_dir = dataset_root / car_id
        (car_dir / "image").mkdir(parents=True, exist_ok=True)
        (car_dir / "depth").mkdir(exist_ok=True)

        boxes = _make_car(rng)
        for res in voxel_resolutions:
            name = {64: "voxel.npz", 32: "voxel_32.npz", 128: "voxel_128.npz"}[res]
            np.savez_compressed(car_dir / name, voxel=_voxelize(boxes, res))
        np.save(car_dir / "pcl_color.npy", _surface_pcl(boxes, n_points, rng))

        # cameras uniformly on the upper hemisphere at radius cam_r
        theta = np.arccos(1 - rng.uniform(0.05, 0.95, n_views))
        phi = rng.uniform(0, 2 * math.pi, n_views)
        origins = np.stack(
            [
                cam_r * np.sin(theta) * np.cos(phi),
                cam_r * np.cos(theta),
                cam_r * np.sin(theta) * np.sin(phi),
            ],
            axis=-1,
        ).astype(np.float32)
        cam2worlds = np.asarray(create_cam2world_matrix(jnp.asarray(origins), "y"))

        cam_dict = {}
        focal = 1.0 / math.tan(math.radians(fov) / 2.0)
        K = np.array(
            [[focal, 0, 0, 0], [0, focal, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
            dtype=np.float32,
        )
        for i in range(n_views):
            cam_dict[f"world_mat_inv_{i}"] = cam2worlds[i]
            cam_dict[f"world_mat_{i}"] = np.linalg.inv(cam2worlds[i])
            cam_dict[f"camera_mat_{i}"] = K
        np.savez(car_dir / "cameras.npz", **cam_dict)

        pix, depth = _render_views(
            _voxelize(boxes, voxel_resolutions[0]), cam2worlds, img_size,
            fov, ray_start, ray_end,
        )
        for i in range(n_views):
            img16 = np.clip(pix[i], 0, 1)
            rgba = np.concatenate(
                [img16[..., ::-1], np.ones_like(img16[..., :1])], axis=-1
            )  # BGR + alpha for cv2
            cv2.imwrite(
                str(car_dir / "image" / f"{i:04}.png"),
                (rgba * (2 ** 16 - 1)).astype(np.uint16),
            )
            np.save(car_dir / "depth" / f"{i:04}.npy", depth[i].astype(np.float32))

    # split lists live next to the dataset root (datasets.py:53-57)
    for mode in ("twenty", "thousand", "train"):
        (root / f"{mode}.lst").write_text("\n".join(car_ids) + "\n")
    (root / "single.lst").write_text(car_ids[0] + "\n")
    (root / "val.lst").write_text("\n".join(car_ids) + "\n")
    return dataset_root
