"""Camera math for the offline Blender data pipeline (bpy-free, testable).

Parity target: reference blender_renderer/utils.py (P = K [R|t] composition,
spherical camera sampling) and blender_renderer/draw.py (camera-distribution
plots). The bpy-specific extraction of K/RT from Blender objects lives in
render_shapenet.py; everything here is plain numpy so the convention can be
unit-tested without Blender.
"""

from __future__ import annotations

import math

import numpy as np


def sample_cam(n: int, r_min: float = 1.1, r_max: float = 1.1,
               seed: int | None = None) -> np.ndarray:
    """n camera origins uniform over the upper hemisphere shell (y-up)."""
    rng = np.random.default_rng(seed)
    theta = np.arccos(1 - rng.uniform(0, 1, n))
    theta = np.clip(theta, 1e-5, math.pi - 1e-5)
    phi = rng.uniform(0, 2 * math.pi, n)
    r = rng.uniform(r_min, r_max, n)
    return np.stack(
        [r * np.sin(theta) * np.cos(phi),
         r * np.cos(theta),
         r * np.sin(theta) * np.sin(phi)], axis=-1,
    )


def look_at_world_origin(origin: np.ndarray) -> np.ndarray:
    """cam2world matrix looking at the world origin, y-up (matches
    ops.rays.create_cam2world_matrix so rendered data and the NeRF renderer
    share one convention)."""
    forward = -origin / np.linalg.norm(origin)
    up = np.array([0.0, 1.0, 0.0])
    left = np.cross(up, forward)
    left /= np.linalg.norm(left)
    true_up = np.cross(forward, left)
    true_up /= np.linalg.norm(true_up)
    mat = np.eye(4)
    mat[:3, :3] = np.stack([-left, -true_up, forward], axis=-1)
    mat[:3, 3] = origin
    return mat


def intrinsics(fov_deg: float) -> np.ndarray:
    """Normalized 4×4 K with focal = 1/tan(fov/2) (cameras.npz camera_mat_i)."""
    focal = 1.0 / math.tan(math.radians(fov_deg) / 2.0)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = focal
    return K


def projection_matrix(K: np.ndarray, cam2world: np.ndarray) -> np.ndarray:
    """3×4 P = K [R|t] from normalized intrinsics + cam2world
    (reference blender_renderer/utils.py `get_3x4_P_matrix_from_blender`)."""
    world2cam = np.linalg.inv(cam2world)
    return (K @ world2cam)[:3]


def project_points(points: np.ndarray, K: np.ndarray,
                   cam2world: np.ndarray) -> np.ndarray:
    """World points → normalized image coords (u, v, depth)
    (reference blender_renderer/project.py depth-backprojection check)."""
    P = projection_matrix(K, cam2world)
    homo = np.concatenate([points, np.ones((len(points), 1))], axis=1)
    uvz = homo @ P.T
    uv = uvz[:, :2] / uvz[:, 2:3]
    return np.concatenate([uv, uvz[:, 2:3]], axis=1)


def plot_camera_distribution(origins: np.ndarray, out_path) -> None:
    """3-D scatter of sampled camera origins (reference blender_renderer/draw.py)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(origins[:, 0], origins[:, 1], origins[:, 2], s=4)
    ax.set_xlabel("x"), ax.set_ylabel("y"), ax.set_zlabel("z")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
