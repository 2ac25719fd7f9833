"""Geometry diagnostics: chamfer distance, pose-consistency checks, KD-tree
negative sampling, critical points.

Parity targets:
  * chamfer distance: reference misc/chamfer.py (the repo's only CUDA
    extension — replaced by a brute-force JAX pairwise min, chunked to bound
    memory; exact, runs on TPU or CPU).
  * pose verification: reference misc/checkpos/{check_pos,reproject,test}.py
    and blender_renderer/project.py — backproject a GT depth map with the
    stored camera and measure chamfer distance to the GT point cloud; the
    end-to-end check of the camera convention.
  * KD-tree negative sampling: reference misc/kdt.py.
  * PointNet critical points: reference misc/extract_critical_pts.py — the
    input points that attain the final max-pool.
"""

from __future__ import annotations

import argparse
import math
from functools import partial
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def chamfer_distance(a: np.ndarray, b: np.ndarray, chunk: int = 4096) -> float:
    """Symmetric chamfer distance between (N, 3) and (M, 3) point sets.

    Brute-force pairwise squared distances, scanned in chunks to bound
    memory; padded rows repeat the first point and are masked out of the mean.
    """
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)

    def padded(x):
        n_chunks = max(1, -(-x.shape[0] // chunk))
        pad = n_chunks * chunk - x.shape[0]
        return jnp.concatenate([x, jnp.broadcast_to(x[:1], (pad, 3))])

    @partial(jax.jit, static_argnames=("n",))
    def side(x_padded, y, n):
        xs = x_padded.reshape(-1, chunk, 3)

        def body(carry, xc):
            d = jnp.sum((xc[:, None, :] - y[None, :, :]) ** 2, axis=-1)
            return carry, jnp.min(d, axis=1)

        _, mins = jax.lax.scan(body, 0.0, xs)
        return jnp.sum(mins.reshape(-1)[:n]) / n

    return float(
        side(padded(a), b, n=a.shape[0]) + side(padded(b), a, n=b.shape[0])
    )


def backproject_depth(
    depth: np.ndarray, cam2world: np.ndarray, fov: float
) -> np.ndarray:
    """GT depth map + camera → world points (the checkpos reprojection)."""
    img_size = depth.shape[0]
    focal = 1.0 / math.tan(math.radians(fov) / 2.0)
    ys, xs = np.nonzero(depth > 0)
    d = depth[ys, xs]
    x_cam = (2 * xs - (img_size - 1)) / (img_size - 1) / focal * d
    y_cam = (2 * ys - (img_size - 1)) / (img_size - 1) / focal * d
    pts = np.stack([x_cam, y_cam, d, np.ones_like(d)], axis=1)
    return (pts @ cam2world.T)[:, :3]


def check_camera_convention(
    car_dir: str | Path, view: int = 0, fov: float = 49.134342641202636,
    img_size: int | None = None,
) -> float:
    """Chamfer distance between backprojected GT depth and the GT point cloud.

    Small values (≈ voxel size) confirm the camera convention end-to-end
    (reference misc/checkpos/reproject.py:1-30).
    """
    car_dir = Path(car_dir)
    cams = np.load(car_dir / "cameras.npz")
    cam = cams[f"world_mat_inv_{view}"]
    depth_npy = car_dir / "depth" / f"{view:04}.npy"
    if depth_npy.exists():
        depth = np.load(depth_npy)
    else:
        from ..data.exr import read_exr_depth

        depth = read_exr_depth(
            car_dir / "depth" / f"{view:04}0001.exr", img_size
        )
    pts = backproject_depth(depth, cam, fov)
    pcl = np.load(car_dir / "pcl_color.npy")[:, :3]
    return chamfer_distance(pts, pcl)


def kdtree_negative_samples(
    pcl: np.ndarray, n_samples: int, radius: float = 0.05, seed: int = 0
) -> np.ndarray:
    """Uniform cube samples farther than `radius` from the surface
    (reference misc/kdt.py negative-sampling strategy)."""
    from scipy.spatial import KDTree

    rng = np.random.default_rng(seed)
    tree = KDTree(pcl[:, :3])
    out = []
    while sum(len(o) for o in out) < n_samples:
        cand = rng.uniform(-0.6, 0.6, (n_samples * 2, 3))
        dist, _ = tree.query(cand)
        out.append(cand[dist > radius])
    return np.concatenate(out)[:n_samples]


def pointnet_critical_points(encoder_apply, params, pcl: np.ndarray) -> np.ndarray:
    """Indices of input points that attain the PointNet final max-pool
    (reference misc/extract_critical_pts.py; cf. pointnet.py:113-141)."""
    import flax.linen as nn
    # recompute the pre-pool features and take per-channel argmax
    pcl_j = jnp.asarray(pcl)[None]

    def prepool(params, p):
        # mirror ResnetPointnet.__call__ up to the final pool
        mdl_params = params["params"]

        def dense(name, x):
            k = mdl_params[name]["kernel"]
            b = mdl_params[name]["bias"]
            return x @ k + b

        def block(name, x):
            bp = mdl_params[name]
            h = nn.relu(x) @ bp["fc_0"]["kernel"] + bp["fc_0"]["bias"]
            dx = nn.relu(h) @ bp["fc_1"]["kernel"] + bp["fc_1"]["bias"]
            if "shortcut" in bp:
                x = x @ bp["shortcut"]["kernel"]
            return x + dx

        net = dense("fc_pos", p)
        net = block("block_0", net)
        for i in range(1, 5):
            pooled = jnp.max(net, axis=1, keepdims=True)
            net = jnp.concatenate([net, jnp.broadcast_to(pooled, net.shape)], 2)
            net = block(f"block_{i}", net)
        return net

    feats = prepool(params, pcl_j)[0]  # (T, F)
    critical = np.unique(np.asarray(jnp.argmax(feats, axis=0)))
    return critical


def main(argv=None):
    parser = argparse.ArgumentParser(description="Geometry diagnostics")
    sub = parser.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("chamfer", help="chamfer distance between two point files")
    c.add_argument("a"), c.add_argument("b")
    k = sub.add_parser("checkpos", help="camera-convention check for a car dir")
    k.add_argument("car_dir"), k.add_argument("--view", type=int, default=0)
    k.add_argument("--fov", type=float, default=49.134342641202636)
    args = parser.parse_args(argv)
    if args.cmd == "chamfer":
        a = np.load(args.a)[:, :3]
        b = np.load(args.b)[:, :3]
        print("chamfer:", chamfer_distance(a, b))
    elif args.cmd == "checkpos":
        d = check_camera_convention(args.car_dir, args.view, args.fov)
        print(f"backprojection chamfer vs GT pcl: {d:.6f}")


if __name__ == "__main__":
    main()
