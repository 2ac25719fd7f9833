"""Blender batch renderer for ShapeNet objects (runs INSIDE Blender).

Parity target: reference blender_renderer/render_blender.py — renders N views
of an .obj with image / depth(EXR) / normal / albedo passes, writes
cameras.npz (camera_mat_i, world_mat_i, world_mat_inv_i) and a surface
pointcloud.npz, producing the exact on-disk dataset layout consumed by
data/shapenet.py (and reproduced by data/synthetic.py for tests).

Usage (Blender >= 2.9; bpy is NOT available in the training image — this
script is shipped for offline data production):

  blender --background --python render_shapenet.py -- \
      /path/to/model.obj --output_folder /data/my_shapenetcar --views 24

Batch:
  find ShapeNetCore/02958343 -name '*.obj' | \
      xargs -n1 -P4 -I{} blender --background --python render_shapenet.py -- \
      {} --output_folder /data/my_shapenetcar --views 24
"""

import argparse
import math
import sys
from pathlib import Path

import numpy as np

try:
    import bpy
    from mathutils import Matrix, Vector
except ImportError as exc:  # pragma: no cover - only runs inside Blender
    raise SystemExit(
        "render_shapenet.py must run inside Blender: "
        "blender --background --python render_shapenet.py -- <obj> [...]"
    ) from exc

sys.path.append(str(Path(__file__).resolve().parent))
from camera_utils import (  # noqa: E402
    BLENDER_CAM_FLIP,
    blender_cam_pose,
    sample_cam,
    sample_points_on_triangles,
)


def parse_args():
    argv = sys.argv[sys.argv.index("--") + 1:] if "--" in sys.argv else []
    parser = argparse.ArgumentParser()
    parser.add_argument("obj", type=str)
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--output_folder", type=str, default="/tmp")
    parser.add_argument("--resolution", type=int, default=256)
    parser.add_argument("--scale_to_unit", action="store_true", default=True)
    parser.add_argument("--remove_doubles", action="store_true", default=True)
    parser.add_argument("--edge_split", action="store_true", default=True)
    parser.add_argument("--fov", type=float, default=49.134342641202636)
    parser.add_argument("--cam_r", type=float, default=1.1)
    parser.add_argument("--n_surface_points", type=int, default=100000)
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args(argv)


def setup_render(resolution: int):
    scene = bpy.context.scene
    scene.render.engine = "BLENDER_EEVEE" if hasattr(scene.render, "engine") else scene.render.engine
    scene.render.image_settings.file_format = "PNG"
    scene.render.image_settings.color_depth = "16"
    scene.render.image_settings.color_mode = "RGBA"
    scene.render.film_transparent = True
    scene.render.resolution_x = resolution
    scene.render.resolution_y = resolution
    scene.render.resolution_percentage = 100

    scene.use_nodes = True
    scene.view_layers[0].use_pass_z = True
    scene.view_layers[0].use_pass_normal = True
    scene.view_layers[0].use_pass_diffuse_color = True
    tree = scene.node_tree
    for node in list(tree.nodes):
        tree.nodes.remove(node)
    render_layers = tree.nodes.new("CompositorNodeRLayers")

    depth_out = tree.nodes.new("CompositorNodeOutputFile")
    depth_out.label = "Depth"
    depth_out.format.file_format = "OPEN_EXR"
    depth_out.format.color_depth = "16"
    tree.links.new(render_layers.outputs["Depth"], depth_out.inputs[0])

    normal_out = tree.nodes.new("CompositorNodeOutputFile")
    normal_out.label = "Normal"
    normal_out.format.file_format = "PNG"
    tree.links.new(render_layers.outputs["Normal"], normal_out.inputs[0])

    albedo_out = tree.nodes.new("CompositorNodeOutputFile")
    albedo_out.label = "Albedo"
    albedo_out.format.file_format = "PNG"
    tree.links.new(render_layers.outputs["DiffCol"], albedo_out.inputs[0])
    return depth_out, normal_out, albedo_out


def load_and_normalize(obj_path: str, remove_doubles: bool, edge_split: bool):
    bpy.ops.object.select_all(action="SELECT")
    bpy.ops.object.delete()
    bpy.ops.import_scene.obj(filepath=obj_path)
    meshes = [o for o in bpy.context.scene.objects if o.type == "MESH"]
    bpy.ops.object.select_all(action="DESELECT")
    for obj in meshes:
        obj.select_set(True)
    bpy.context.view_layer.objects.active = meshes[0]
    bpy.ops.object.join()
    obj = bpy.context.view_layer.objects.active

    if remove_doubles:
        bpy.ops.object.mode_set(mode="EDIT")
        bpy.ops.mesh.remove_doubles()
        bpy.ops.object.mode_set(mode="OBJECT")
    if edge_split:
        mod = obj.modifiers.new("EdgeSplit", "EDGE_SPLIT")
        mod.split_angle = 1.32645
        bpy.ops.object.modifier_apply(modifier="EdgeSplit")

    # normalize into the unit cube around the origin (the ±0.5-ish extent the
    # 1.2³ voxel cube assumes)
    bbox = np.array([obj.matrix_world @ Vector(c) for c in obj.bound_box])
    center = (bbox.max(0) + bbox.min(0)) / 2
    scale = 1.0 / np.abs(bbox - center).max() / 2
    obj.location -= Vector(center)
    obj.scale = (scale, scale, scale)
    bpy.ops.object.transform_apply(location=True, scale=True)
    return obj


def camera_matrices(cam):
    """Extract normalized K and world2cam from the Blender camera (the
    convention checked by blender_renderer/project.py)."""
    scene = bpy.context.scene
    f_in_mm = cam.data.lens
    sensor = cam.data.sensor_width
    focal = 2 * f_in_mm / sensor  # normalized focal, = 1/tan(fov/2)
    K = np.eye(4)
    K[0, 0] = K[1, 1] = focal

    # Blender cameras look down -Z with +Y up; the dataset convention has the
    # camera looking down +Z with +Y down (cv-style) — flip accordingly.
    cam2world_blender = np.array(cam.matrix_world)
    cam2world = cam2world_blender @ BLENDER_CAM_FLIP
    return K, cam2world


def sample_surface_points(obj, n_points: int, rng) -> np.ndarray:
    mesh = obj.data
    mesh.calc_loop_triangles()
    tris = np.array([t.vertices[:] for t in mesh.loop_triangles])
    verts = np.array([v.co[:] for v in mesh.vertices])
    return sample_points_on_triangles(verts, tris, n_points, rng)


def main():
    args = parse_args()
    rng = np.random.default_rng(args.seed)
    obj_path = Path(args.obj)
    car_name = obj_path.parent.stem
    out_dir = Path(args.output_folder) / car_name
    for sub in ("image", "depth", "normal", "img_shaded"):
        (out_dir / sub).mkdir(parents=True, exist_ok=True)

    depth_out, normal_out, albedo_out = setup_render(args.resolution)
    obj = load_and_normalize(str(obj_path), args.remove_doubles, args.edge_split)

    scene = bpy.context.scene
    cam = scene.camera or bpy.data.objects.new(
        "Camera", bpy.data.cameras.new("Camera")
    )
    if cam.name not in scene.collection.objects:
        scene.collection.objects.link(cam)
    scene.camera = cam
    cam.data.angle = math.radians(args.fov)

    origins = sample_cam(args.views, args.cam_r, args.cam_r, args.seed)
    cam_dict = {}
    for i, origin in enumerate(origins):
        # Pose set directly from the dataset's y-up look-at (see
        # camera_utils.blender_cam_pose — to_track_quat's up axis references
        # world +Z, which is the z-up reference pipeline's convention, not ours).
        cam.matrix_world = Matrix(blender_cam_pose(origin).tolist())
        bpy.context.view_layer.update()

        scene.render.filepath = str(out_dir / "image" / f"{i:04}")
        depth_out.base_path = str(out_dir / "depth")
        depth_out.file_slots[0].path = f"{i:04}"
        normal_out.base_path = str(out_dir / "normal")
        normal_out.file_slots[0].path = f"{i:04}"
        albedo_out.base_path = str(out_dir / "img_shaded")
        albedo_out.file_slots[0].path = f"{i:04}"
        bpy.ops.render.render(write_still=True)

        K, cam2world = camera_matrices(cam)
        cam_dict[f"camera_mat_{i}"] = K
        cam_dict[f"world_mat_{i}"] = np.linalg.inv(cam2world)
        cam_dict[f"world_mat_inv_{i}"] = cam2world
    np.savez(out_dir / "cameras.npz", **cam_dict)

    points = sample_surface_points(obj, args.n_surface_points, rng)
    np.savez(out_dir / "pointcloud.npz", points=points)
    print("Rendered", args.views, "views of", car_name, "to", out_dir)


if __name__ == "__main__":
    main()
