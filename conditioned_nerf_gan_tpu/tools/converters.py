"""Format converters and small viewers.

Parity targets: reference misc/ npy→obj/ply converters, write_pcl_color.py,
pcl subsampler, and the EXR depth viewer.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def npy_to_obj(npy_path: str | Path, out_path: str | Path | None = None) -> Path:
    """(N, 3) or (N, 6) npy point cloud → .obj vertices (colors as 0-255)."""
    pts = np.load(npy_path)
    out_path = Path(out_path or Path(npy_path).with_suffix(".obj"))
    with open(out_path, "w") as f:
        for row in pts:
            line = f"v {row[0]} {row[1]} {row[2]}"
            if row.shape[0] >= 6:
                c = np.clip(row[3:6] * 255 + 0.5, 0, 255).astype(np.uint8)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
    return out_path


def npy_to_ply(npy_path: str | Path, out_path: str | Path | None = None) -> Path:
    """(N, 3|6) npy point cloud → binary-less ASCII .ply."""
    pts = np.load(npy_path)
    has_color = pts.shape[1] >= 6
    out_path = Path(out_path or Path(npy_path).with_suffix(".ply"))
    with open(out_path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(pts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_color:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for row in pts:
            line = f"{row[0]} {row[1]} {row[2]}"
            if has_color:
                c = np.clip(row[3:6] * 255 + 0.5, 0, 255).astype(np.uint8)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
    return out_path


def write_pcl_color(
    pointcloud_npz: str | Path, image_dir: str | Path, cameras_npz: str | Path,
    out_path: str | Path, fov: float = 49.134342641202636,
) -> Path:
    """Colorize a surface point cloud by projecting into rendered views
    (reference misc/write_pcl_color.py): each point takes the pixel color of
    the first view where it projects inside the image.
    """
    import cv2

    data = np.load(pointcloud_npz)
    points = data["points"] if "points" in data.files else data[data.files[0]]
    cams = np.load(cameras_npz)
    n_views = len([k for k in cams.files if k.startswith("world_mat_inv_")])
    colors = np.zeros((len(points), 3), np.float64)
    filled = np.zeros(len(points), bool)
    import math

    focal = 1.0 / math.tan(math.radians(fov) / 2.0)
    for view in range(n_views):
        img_path = Path(image_dir) / f"{view:04}.png"
        if not img_path.exists():
            continue
        img = cv2.imread(str(img_path), cv2.IMREAD_UNCHANGED)
        img = cv2.cvtColor(img, cv2.COLOR_BGRA2RGB) / (2 ** 16 - 1)
        size = img.shape[0]
        world2cam = np.linalg.inv(cams[f"world_mat_inv_{view}"])
        homo = np.concatenate([points, np.ones((len(points), 1))], 1)
        cam_pts = homo @ world2cam.T
        z = cam_pts[:, 2]
        u = cam_pts[:, 0] / z * focal
        v = cam_pts[:, 1] / z * focal
        xs = np.round((u + 1) * (size - 1) / 2).astype(int)
        ys = np.round((v + 1) * (size - 1) / 2).astype(int)
        ok = (~filled) & (z > 0) & (xs >= 0) & (xs < size) & (ys >= 0) & (ys < size)
        colors[ok] = img[ys[ok], xs[ok]]
        filled |= ok
    out = np.concatenate([points, colors], 1).astype(np.float32)
    np.save(out_path, out)
    return Path(out_path)


def subsample_pcl(npy_path: str | Path, n_points: int,
                  out_path: str | Path | None = None, seed: int = 0) -> Path:
    pcl = np.load(npy_path)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(pcl))[:n_points]
    out_path = Path(out_path or Path(npy_path).with_name(
        Path(npy_path).stem + f"_{n_points}.npy"))
    np.save(out_path, pcl[idx])
    return out_path


def exr_to_png(exr_path: str | Path, out_path: str | Path | None = None) -> Path:
    """Visualize an EXR depth map (misc EXR viewers)."""
    import cv2

    from ..data.exr import read_exr_depth

    depth = read_exr_depth(exr_path)
    vis = depth / max(depth.max(), 1e-6)
    out_path = Path(out_path or Path(exr_path).with_suffix(".png"))
    cv2.imwrite(str(out_path), (vis * 255).astype(np.uint8))
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Converters")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in ("obj", "ply"):
        p = sub.add_parser(name)
        p.add_argument("npy"), p.add_argument("--out", default=None)
    s = sub.add_parser("subsample")
    s.add_argument("npy"), s.add_argument("n", type=int)
    e = sub.add_parser("exr")
    e.add_argument("exr"), e.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    if args.cmd == "obj":
        print(npy_to_obj(args.npy, args.out))
    elif args.cmd == "ply":
        print(npy_to_ply(args.npy, args.out))
    elif args.cmd == "subsample":
        print(subsample_pcl(args.npy, args.n))
    elif args.cmd == "exr":
        print(exr_to_png(args.exr, args.out))


if __name__ == "__main__":
    main()
