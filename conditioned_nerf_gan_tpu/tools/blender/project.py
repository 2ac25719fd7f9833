"""Depth-backprojection self-check for the Blender data pipeline.

Parity target: reference blender_renderer/project.py:1-113 — reproject each
view's GT depth+rgb into world space using the intrinsics and cam2world from
cameras.npz, and compare against the GT point cloud to verify the camera
convention of a freshly rendered dataset. The reference pops an open3d
window; this headless version reports the chamfer distance (small ≈ pose
matches) and can dump the colored points to a .obj for offline viewing.
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np


def load_cam2world_gt(car_dir: Path, view: int) -> np.ndarray:
    return np.load(Path(car_dir) / "cameras.npz")[f"world_mat_inv_{int(view)}"]


def _load_depth(car_dir: Path, view: int, img_size: int | None):
    npy = car_dir / "depth" / f"{view:04}.npy"
    if npy.exists():
        depth = np.load(npy)
        if img_size and depth.shape[0] != img_size:
            import cv2

            depth = cv2.resize(depth, (img_size, img_size),
                               interpolation=cv2.INTER_NEAREST)
        return depth
    from ...data.exr import read_exr_depth

    return read_exr_depth(car_dir / "depth" / f"{view:04d}0001.exr", img_size)


def backproject_points(
    car_dir: str | Path, view: int, img_size: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """GT depth + rgb of one view → (world points (N,3), colors (N,3) in [0,1]).

    Pixel (i, j) at depth Z maps to camera space via the NDC intrinsics
    (reference project.py:53-60):
        X = (2j - (W-1))/(W-1) · Z / K[0,0]
        Y = (2i - (H-1))/(H-1) · Z / K[1,1]
    then through cam2world. Vectorized (the reference loops per pixel).
    """
    car_dir = Path(car_dir)
    depth = _load_depth(car_dir, view, img_size)
    from ...data.shapenet import _read_resize_png16

    rgb = _read_resize_png16(car_dir / "image" / f"{view:04}.png",
                             depth.shape[0])
    rgb = rgb * 0.5 + 0.5  # loader returns [-1,1]
    K = np.load(car_dir / "cameras.npz")[f"camera_mat_{view}"]
    cam2world = load_cam2world_gt(car_dir, view)

    H, W = depth.shape
    ys, xs = np.nonzero(depth > 1e-3)
    Z = depth[ys, xs]
    X = (2 * xs - (W - 1)) / (W - 1) * Z / K[0, 0]
    Y = (2 * ys - (H - 1)) / (H - 1) * Z / K[1, 1]
    pts = np.stack([X, Y, Z, np.ones_like(Z)], axis=1)
    world = (pts @ cam2world.T)[:, :3]
    return world.astype(np.float32), rgb[ys, xs].astype(np.float32)


def check_backprojection(
    car_dir: str | Path, views: int = 4, img_size: int | None = None,
) -> float:
    """Chamfer distance between multi-view backprojections and the GT pcl."""
    from ..geometry import chamfer_distance

    car_dir = Path(car_dir)
    pts = np.concatenate(
        [backproject_points(car_dir, v, img_size)[0]
         for v in random.sample(range(views), views)], axis=0,
    )
    npz = car_dir / "pointcloud.npz"
    if npz.exists():
        gt = np.load(npz)["points"]
    else:
        gt = np.load(car_dir / "pcl_color.npy")[:, :3]
    # subsample for the O(N·M) pairwise pass
    rng = np.random.default_rng(0)
    if pts.shape[0] > 4096:
        pts = pts[rng.choice(pts.shape[0], 4096, replace=False)]
    if gt.shape[0] > 4096:
        gt = gt[rng.choice(gt.shape[0], 4096, replace=False)]
    return chamfer_distance(pts, gt)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("path", help="model dir with cameras.npz, image/, depth/")
    parser.add_argument("-v", "--views", type=int, default=4)
    parser.add_argument("-s", "--img_size", type=int, default=None)
    parser.add_argument("--obj", default=None,
                        help="dump backprojected colored points to this .obj")
    opt = parser.parse_args(argv)

    if opt.obj:
        pts, colors = [], []
        for v in range(opt.views):
            p, c = backproject_points(opt.path, v, opt.img_size)
            pts.append(p)
            colors.append(c)
        pc = np.concatenate(
            [np.concatenate(pts, 0), np.concatenate(colors, 0)], axis=1
        )
        with open(opt.obj, "w") as f:
            for row in pc:
                f.write("v " + " ".join(f"{x:.6f}" for x in row) + "\n")
        print(f"wrote {pc.shape[0]} points to {opt.obj}")

    d = check_backprojection(opt.path, opt.views, opt.img_size)
    print(f"chamfer(backprojection, GT pcl) = {d:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
