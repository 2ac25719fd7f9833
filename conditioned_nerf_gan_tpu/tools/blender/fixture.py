"""Exporter-math fixture: a ShapeNet tree produced by the REAL offline
pipeline, with only Blender's rasterizer replaced.

`render_shapenet.py` needs bpy; this module drives every bpy-free part of
that exporter on analytic box meshes — camera sampling (`sample_cam`),
Blender pose construction (`blender_cam_pose`), the pose→cameras.npz
extraction (`camera_matrices`' math, reference blender_renderer/
render_blender.py:133-147), intrinsics, and area-weighted surface sampling
(`sample_points_on_triangles`) — and renders image/depth with the framework's
own volume renderer in Blender's place (depth written as real half-float RLE
EXRs with the 65504 background sentinel, data/exr.py writer).

The output tree is then completed by the same tools the real pipeline uses
(tools.write_pcl_color backprojection, tools.pcl2voxel voxelization,
tools.prepare_data list writing), so a Trainer consuming it has exercised the
exporter→dataset convention chain end-to-end without bpy or ShapeNet
(r3 verdict item 7).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

from .camera_utils import (
    BLENDER_CAM_FLIP,
    blender_cam_pose,
    intrinsics,
    sample_cam,
    sample_points_on_triangles,
)

_BOX_FACES = (
    # 12 triangles over the 8 corners of a unit box (corner bit order xyz)
    (0, 1, 3), (0, 3, 2), (4, 6, 7), (4, 7, 5),  # x faces
    (0, 4, 5), (0, 5, 1), (2, 3, 7), (2, 7, 6),  # y faces
    (0, 2, 6), (0, 6, 4), (1, 5, 7), (1, 7, 3),  # z faces
)


def _box_mesh(center, half):
    corners = np.array(
        [[center[0] + (1 if b & 4 else -1) * half[0],
          center[1] + (1 if b & 2 else -1) * half[1],
          center[2] + (1 if b & 1 else -1) * half[2]] for b in range(8)],
        dtype=np.float32,
    )
    return corners, np.array(_BOX_FACES, dtype=np.int64)


def _compound_mesh(boxes):
    verts, tris = [], []
    offset = 0
    for center, half, _color in boxes:
        v, t = _box_mesh(center, half)
        verts.append(v)
        tris.append(t + offset)
        offset += len(v)
    return np.concatenate(verts), np.concatenate(tris)


_RENDER_CACHE: dict = {}


def _render_views(boxes, cam2worlds, img_size, fov, ray_start, ray_end,
                  voxel_resolution=64, num_steps=64):
    """Blender stand-in: render the box scene at the exporter's cameras with
    the framework renderer; background depth is inf (Blender's convention)."""
    import jax
    import jax.numpy as jnp

    from ...data.synthetic import _voxelize

    vox = _voxelize(boxes, voxel_resolution)
    B = cam2worlds.shape[0]
    vol = jnp.asarray(vox.transpose(2, 1, 0, 3))[None]
    vol = jnp.broadcast_to(vol, (B, *vol.shape[1:]))

    # one compile per shape, reused across cars; the volume is a jit
    # ARGUMENT, never a closure constant (big closure constants inline into
    # the uploaded program and 413/500 the remote TPU compile helper)
    key = (B, img_size, num_steps, fov, ray_start, ray_end)
    render = _RENDER_CACHE.get(key)
    if render is None:

        def render_fn(vol, cams):
            from ...ops import (
                distance2depth,
                get_initial_rays,
                transform_rays,
                trilinear_point_features,
                volume_integrate,
            )

            pts, z_vals, dirs = get_initial_rays(
                B, num_steps, fov, (img_size, img_size), ray_start, ray_end
            )
            wpts, z_vals, _, _ = transform_rays(pts, z_vals, dirs, cams)
            flat = wpts.reshape(B, -1, 3) / 0.6
            feats = trilinear_point_features(vol, flat, padding_mode="zeros")
            feats = feats.reshape(B, img_size * img_size, num_steps, 4)
            rgb = feats[..., 1:4]
            sigma = jnp.where(feats[..., 0:1] > 0.5, 800.0, -800.0)
            pix, dist, weights = volume_integrate(
                jnp.concatenate([rgb, sigma], -1), z_vals,
                clamp_mode="relu", white_back=True,
            )
            depth = distance2depth(dist, dirs)
            coverage = weights.sum(-2)[..., 0]
            return (
                pix.reshape(B, img_size, img_size, 3),
                depth.reshape(B, img_size, img_size),
                coverage.reshape(B, img_size, img_size),
            )

        render = jax.jit(render_fn)
        _RENDER_CACHE[key] = render

    pix, depth, coverage = render(vol, jnp.asarray(cam2worlds))
    depth = np.asarray(depth).copy()
    depth[np.asarray(coverage) < 0.5] = np.inf  # Blender: no hit → inf
    return np.asarray(pix), depth


def export_car(car_dir: Path, boxes, n_views: int, img_size: int,
               fov: float, cam_r: float, ray_start: float, ray_end: float,
               n_surface_points: int, seed: int) -> None:
    """One car through the exporter flow (render_shapenet.py:158-205 sans bpy)."""
    import cv2

    from ...data.exr import write_exr_depth

    (car_dir / "image").mkdir(parents=True, exist_ok=True)
    (car_dir / "depth").mkdir(exist_ok=True)

    rng = np.random.default_rng(seed)
    origins = sample_cam(n_views, cam_r, cam_r, seed)
    K = intrinsics(fov)

    cam_dict = {}
    cam2worlds = []
    for i, origin in enumerate(origins):
        # the exporter sets cam.matrix_world = blender_cam_pose(origin), then
        # camera_matrices() extracts cam2world = matrix_world @ FLIP — the
        # same two steps, minus the bpy round trip
        matrix_world = blender_cam_pose(origin)
        cam2world = matrix_world @ BLENDER_CAM_FLIP
        cam_dict[f"camera_mat_{i}"] = K
        cam_dict[f"world_mat_{i}"] = np.linalg.inv(cam2world)
        cam_dict[f"world_mat_inv_{i}"] = cam2world
        cam2worlds.append(cam2world)
    np.savez(car_dir / "cameras.npz", **cam_dict)

    pix, depth = _render_views(
        boxes, np.stack(cam2worlds).astype(np.float32), img_size, fov,
        ray_start, ray_end,
    )
    for i in range(n_views):
        rgba = np.concatenate(
            [np.clip(pix[i], 0, 1)[..., ::-1], np.ones_like(pix[i][..., :1])],
            axis=-1,
        )
        cv2.imwrite(str(car_dir / "image" / f"{i:04}.png"),
                    (rgba * (2 ** 16 - 1)).astype(np.uint16))
        # Blender's depth file-output slot names frames {i:04}0001.exr
        write_exr_depth(car_dir / "depth" / f"{i:04}0001.exr", depth[i])

    verts, tris = _compound_mesh(boxes)
    points = sample_points_on_triangles(verts, tris, n_surface_points, rng)
    np.savez(car_dir / "pointcloud.npz", points=points)


def make_exporter_fixture(
    root: str | Path,
    n_cars: int = 3,
    n_views: int = 6,
    img_size: int = 32,
    fov: float = 49.134342641202636,
    cam_r: float = 1.1,
    ray_start: float = 0.25,
    ray_end: float = 1.95,
    n_surface_points: int = 4096,
    pcl_size: int = 4096,
    voxel_resolutions=(32,),
    seed: int = 0,
) -> Path:
    """Full exporter-pipeline fixture; returns the dataset root.

    Steps (the prepare_data orchestration, tools/prepare_data.py):
    render (this module's bpy-free exporter) → pcl_color backprojection
    (tools.write_pcl_color) → voxelization (tools.pcl2voxel) → .lst splits.
    """
    from ..pcl2voxel import save_voxel_npz
    from ..prepare_data import write_lists
    from ..write_pcl_color import build_pcl_color
    from ...data.synthetic import _make_car

    root = Path(root)
    dataset_root = root / "ShapeNetCar"
    dataset_root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    car_ids = [f"car{idx:04d}" for idx in range(n_cars)]

    for idx, car_id in enumerate(car_ids):
        car_dir = dataset_root / car_id
        boxes = _make_car(rng)
        export_car(car_dir, boxes, n_views, img_size, fov, cam_r,
                   ray_start, ray_end, n_surface_points, seed + idx)
        build_pcl_color(car_dir, num_views=n_views, pcl_size=pcl_size,
                        img_size=img_size, seed=seed)
        for res in voxel_resolutions:
            save_voxel_npz(car_dir, res)

    write_lists(dataset_root, car_ids, overwrite=True)
    return dataset_root
