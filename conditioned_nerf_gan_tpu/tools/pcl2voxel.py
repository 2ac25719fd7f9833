"""Colored point cloud → occupancy+RGB voxel grid (+ orbit videos, MRC export).

Parity target: reference feature_volume/pcl2voxel.py —
  * `pcl2_voxel` (:23-77): clip points into the length³ cube (with optional
    xyz/color gaussian noise), voxelize at `resolution`, store channel 0 =
    occupancy and 1:4 = the mean color of points in the voxel, and save a
    voxel[_32|_128].npz with the grid plus its metadata.
  * voxel orbit videos (:80-159) — rendered here with the framework's own
    first-hit voxel renderer instead of open3d's interactive visualizer.
  * voxel → .mrc (:162-172).

No open3d dependency: voxelization is a numpy scatter-mean.
"""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import numpy as np


def voxelize_pcl(
    pcl: np.ndarray,
    resolution: int,
    length: float = 1.2,
    noise_color: float = 0.0,
    noise_xyz: float = 0.0,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """(N, 6) colored points → (R, R, R, 4) grid [occupancy, r, g, b]."""
    rng = rng or np.random.default_rng()
    points = pcl[:, :3].astype(np.float64).copy()
    colors = pcl[:, 3:].astype(np.float64).copy()
    if noise_xyz:
        points += rng.normal(size=points.shape) * noise_xyz
    if noise_color:
        colors += rng.normal(size=colors.shape) * noise_color
    points = np.clip(points, -length / 2 + 1e-4, length / 2 - 1e-4)
    colors = np.clip(colors, 0.0, 1.0)

    idx = np.floor((points + length / 2) / (length / resolution)).astype(np.int64)
    idx = np.clip(idx, 0, resolution - 1)
    flat = (idx[:, 0] * resolution + idx[:, 1]) * resolution + idx[:, 2]

    color_sum = np.zeros((resolution ** 3, 3))
    count = np.zeros(resolution ** 3)
    np.add.at(color_sum, flat, colors)
    np.add.at(count, flat, 1.0)

    voxel = np.zeros((resolution ** 3, 4))
    occupied = count > 0
    voxel[occupied, 0] = 1.0
    voxel[occupied, 1:] = color_sum[occupied] / count[occupied, None]
    return voxel.reshape(resolution, resolution, resolution, 4)


def save_voxel_npz(
    car_dir: Path,
    resolution: int,
    length: float = 1.2,
    voxel_name: str | None = None,
    noise_color: float = 0.0,
    noise_xyz: float = 0.0,
    rng=None,
) -> Path:
    pcl = np.load(car_dir / "pcl_color.npy")
    voxel = voxelize_pcl(pcl, resolution, length, noise_color, noise_xyz, rng)
    if voxel_name is None:
        voxel_name = {64: "voxel.npz", 32: "voxel_32.npz", 128: "voxel_128.npz"}.get(
            resolution, f"voxel_{resolution}.npz"
        )
    out = car_dir / voxel_name
    np.savez(
        out, voxel=voxel, length=length, resolution=resolution,
        noise_color=noise_color, noise_xyz=noise_xyz,
    )
    return out


def voxel_orbit_video(
    voxel: np.ndarray,
    out_path: Path,
    img_size: int = 256,
    num_frames: int = 96,
    fps: int = 24,
    fov: float = 49.134342641202636,
    cam_r: float = 1.2,
) -> Path:
    """Orbit the voxel grid and write an mp4 using the first-hit renderer."""
    import cv2
    import jax.numpy as jnp

    from ..ops import create_cam2world_matrix
    from ..utils.image import to_uint8
    from .voxel_render import voxel_surface_render

    theta = np.full(num_frames, math.pi / 3)
    phi = np.linspace(0, 2 * math.pi, num_frames, endpoint=False)
    origin = np.stack(
        [cam_r * np.sin(theta) * np.cos(phi),
         cam_r * np.cos(theta),
         cam_r * np.sin(theta) * np.sin(phi)], axis=-1,
    ).astype(np.float32)
    cams = np.asarray(create_cam2world_matrix(jnp.asarray(origin), "y"))

    vol = jnp.asarray(voxel.transpose(2, 1, 0, 3))[None]  # NDHWC
    out_path.parent.mkdir(parents=True, exist_ok=True)
    video = cv2.VideoWriter(
        str(out_path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (img_size, img_size)
    )
    for i in range(num_frames):
        rgb = voxel_surface_render(vol, jnp.asarray(cams[i][None]), img_size, fov)
        video.write(to_uint8(np.asarray(rgb[0]))[..., ::-1])
    video.release()
    return out_path


def voxel_to_mrc(voxel: np.ndarray, out_path: Path) -> Path:
    from ..infer.mrc import write_mrc

    write_mrc(out_path, voxel[..., 0].astype(np.float32))
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Voxelize colored point clouds")
    parser.add_argument("--dataset_path", required=True,
                        help="ShapeNet renders root (contains {car}/pcl_color.npy)")
    parser.add_argument("--resolution", type=int, default=64)
    parser.add_argument("--length", type=float, default=1.2)
    parser.add_argument("--noise_color", type=float, default=0.0)
    parser.add_argument("--noise_xyz", type=float, default=0.0)
    parser.add_argument("--video", action="store_true",
                        help="also write an orbit video per car")
    parser.add_argument("--mrc", action="store_true")
    parser.add_argument("--cars", nargs="*", default=None,
                        help="subset of car ids (default: all)")
    args = parser.parse_args(argv)

    root = Path(args.dataset_path)
    cars = args.cars or sorted(
        p.name for p in root.iterdir() if (p / "pcl_color.npy").exists()
    )
    rng = np.random.default_rng(0)
    for car in cars:
        out = save_voxel_npz(
            root / car, args.resolution, args.length,
            noise_color=args.noise_color, noise_xyz=args.noise_xyz, rng=rng,
        )
        print("Saved", out)
        if args.video or args.mrc:
            voxel = np.load(out)["voxel"]
            if args.video:
                voxel_orbit_video(voxel, root / car / f"voxel_{args.resolution}.mp4")
            if args.mrc:
                voxel_to_mrc(voxel, root / car / f"voxel_{args.resolution}.mrc")


if __name__ == "__main__":
    main()
