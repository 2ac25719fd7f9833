"""Tools tests: voxelization, baseline renderer, geometry checks, converters."""

import numpy as np
import pytest

import jax.numpy as jnp

from conditioned_nerf_gan_tpu.data import make_synthetic_shapenet
from conditioned_nerf_gan_tpu.tools.converters import npy_to_obj, npy_to_ply, subsample_pcl
from conditioned_nerf_gan_tpu.tools.geometry import (
    backproject_depth,
    chamfer_distance,
    check_camera_convention,
    kdtree_negative_samples,
)
from conditioned_nerf_gan_tpu.tools.pcl2voxel import save_voxel_npz, voxelize_pcl
from conditioned_nerf_gan_tpu.tools.voxel_render import voxel_surface_render


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_tools")
    return make_synthetic_shapenet(
        root, n_cars=2, n_views=3, img_size=32, n_points=1024,
        voxel_resolutions=(32,),
    )


def test_voxelize_pcl_layout_and_colors():
    pcl = np.array([
        [0.0, 0.0, 0.0, 1.0, 0.0, 0.0],
        [0.001, 0.001, 0.001, 0.0, 1.0, 0.0],  # same voxel → color averaged
        [0.45, 0.45, 0.45, 0.0, 0.0, 1.0],
    ], np.float32)
    vox = voxelize_pcl(pcl, resolution=8, length=1.2)
    assert vox.shape == (8, 8, 8, 4)
    assert vox[..., 0].sum() == 2  # two occupied voxels
    center = vox[4, 4, 4]
    assert center[0] == 1.0
    np.testing.assert_allclose(center[1:], [0.5, 0.5, 0.0], atol=1e-6)


def test_save_voxel_npz_matches_reference_format(dataset_root):
    out = save_voxel_npz(dataset_root / "car0000", resolution=16, length=1.2,
                         voxel_name="voxel_test.npz")
    data = np.load(out)
    assert set(data.files) >= {"voxel", "length", "resolution"}
    assert data["voxel"].shape == (16, 16, 16, 4)


def test_voxel_surface_render_first_hit(dataset_root):
    import cv2

    car = dataset_root / "car0000"
    vox = np.load(car / "voxel_32.npz")["voxel"]
    cams = np.load(car / "cameras.npz")
    cam = jnp.asarray(cams["world_mat_inv_0"])[None]
    vol = jnp.asarray(vox.transpose(2, 1, 0, 3))[None]
    rgb = np.asarray(voxel_surface_render(
        vol, cam, 32, 49.134342641202636, 0.2, 2.0, 128
    ))[0]
    # silhouette should roughly match the rendered GT image foreground
    gt = cv2.imread(str(car / "image" / "0000.png"), cv2.IMREAD_UNCHANGED)
    gt = cv2.cvtColor(gt, cv2.COLOR_BGRA2RGB) / 65535.0
    gt = cv2.resize(gt, (32, 32), interpolation=cv2.INTER_AREA)
    fg_render = (rgb < 0.97).any(-1)
    fg_gt = (gt < 0.97).any(-1)
    iou = (fg_render & fg_gt).sum() / max((fg_render | fg_gt).sum(), 1)
    assert iou > 0.6


def test_chamfer_distance_analytic():
    a = np.zeros((5, 3))
    b = np.ones((7, 3))
    # one-sided means are both 3 (squared distance), symmetric sum = 6
    np.testing.assert_allclose(chamfer_distance(a, b), 6.0, rtol=1e-5)
    assert chamfer_distance(a, a) == 0.0


def test_camera_convention_roundtrip(dataset_root):
    """Backprojected GT depth lands on the GT point cloud — the checkpos
    invariant that validates the whole camera convention."""
    d = check_camera_convention(dataset_root / "car0000", view=0)
    assert d < 0.01  # squared-distance chamfer; surface≈surface


def test_kdtree_negative_samples(dataset_root):
    pcl = np.load(dataset_root / "car0000" / "pcl_color.npy")
    neg = kdtree_negative_samples(pcl, 64, radius=0.05)
    from scipy.spatial import KDTree

    dist, _ = KDTree(pcl[:, :3]).query(neg)
    assert (dist > 0.05).all()


def test_converters_roundtrip(tmp_path):
    pcl = np.random.default_rng(0).random((10, 6)).astype(np.float32)
    npy = tmp_path / "p.npy"
    np.save(npy, pcl)
    obj = npy_to_obj(npy)
    assert obj.read_text().count("\n") == 10
    ply = npy_to_ply(npy)
    assert "element vertex 10" in ply.read_text()
    sub = subsample_pcl(npy, 4)
    assert np.load(sub).shape == (4, 6)


def test_blender_project_backprojection(dataset_root):
    from conditioned_nerf_gan_tpu.tools.blender.project import (
        backproject_points,
        check_backprojection,
    )

    car = sorted(p for p in dataset_root.iterdir() if p.is_dir())[0]
    pts, colors = backproject_points(car, 0)
    assert pts.shape[1] == 3 and colors.shape == (pts.shape[0], 3)
    assert (colors >= 0).all() and (colors <= 1).all()
    # pose self-check: backprojection lands near the GT point cloud
    d = check_backprojection(car, views=3)
    assert d < 0.05, f"camera convention mismatch: chamfer {d}"


def test_write_pcl_color_tool(dataset_root, capsys):
    from conditioned_nerf_gan_tpu.tools.write_pcl_color import build_pcl_color, main

    car = sorted(p for p in dataset_root.iterdir() if p.is_dir())[0]
    out = build_pcl_color(car, num_views=3, pcl_size=512, img_size=32,
                          overwrite=True)
    pcl = np.load(out)
    assert pcl.shape == (512, 6) and pcl.dtype == np.float32
    # xyz near the object, colors in [0,1]
    assert np.abs(pcl[:, :3]).max() < 2.0
    assert pcl[:, 3:].min() >= 0 and pcl[:, 3:].max() <= 1
    # CLI skips existing files (no --overwrite)
    rc = main([str(dataset_root), "--lists", "twenty", "-v", "3", "-n", "512",
               "-s", "32"])
    assert rc == 0


def test_blender_draw_outputs(dataset_root, tmp_path):
    from conditioned_nerf_gan_tpu.tools.blender.draw import (
        show_img_in_grid,
        show_train_test_cam_dist,
    )

    cars = sorted(p for p in dataset_root.iterdir() if p.is_dir())
    out1 = show_train_test_cam_dist(
        cars[0] / "cameras.npz", cars[1] / "cameras.npz",
        out_path=tmp_path / "cams.png",
    )
    assert out1.exists() and out1.stat().st_size > 0
    out2 = show_img_in_grid(cars[0] / "image", nrows=1,
                            out_path=tmp_path / "grid.png")
    assert out2.exists() and out2.stat().st_size > 0


def test_blender_exporter_pose_matches_renderer_convention():
    """The pose render_shapenet.py assigns to the Blender camera, run through
    its own cameras.npz extraction (matrix_world @ BLENDER_CAM_FLIP), must
    equal the y-up look-at that the NeRF renderer and the synthetic fixture
    use — so a blender-produced tree and training's random cameras share one
    convention by construction. Guards the to_track_quat pitfall (mathutils
    orients the camera's up axis toward world +Z, the z-up reference
    pipeline's convention, not this y-up one)."""
    from conditioned_nerf_gan_tpu.ops import create_cam2world_matrix
    from conditioned_nerf_gan_tpu.tools.blender.camera_utils import (
        BLENDER_CAM_FLIP,
        blender_cam_pose,
        look_at_world_origin,
        sample_cam,
    )

    origins = sample_cam(8, r_min=0.7, r_max=1.5, seed=3)
    ref = np.asarray(create_cam2world_matrix(jnp.asarray(origins), "y"))
    for i, origin in enumerate(origins):
        pose = blender_cam_pose(origin)
        # camera_matrices() extraction: cam2world = matrix_world @ flip
        cam2world = pose @ BLENDER_CAM_FLIP
        np.testing.assert_allclose(cam2world, look_at_world_origin(origin),
                                   atol=1e-12)
        np.testing.assert_allclose(cam2world, ref[i], atol=1e-6)
        # a proper rigid pose: orthonormal rotation, camera at origin[i]
        R = pose[:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
        np.testing.assert_allclose(pose[:3, 3], origin, atol=1e-12)


def test_sample_points_on_triangles_area_weighted():
    from conditioned_nerf_gan_tpu.tools.blender.camera_utils import (
        sample_points_on_triangles,
    )

    # two coplanar right triangles in z=0, areas 0.5 and 8.0
    verts = np.array([
        [0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
        [10.0, 0.0, 0.0], [14.0, 0.0, 0.0], [10.0, 4.0, 0.0],
    ])
    tris = np.array([[0, 1, 2], [3, 4, 5]])
    pts = sample_points_on_triangles(verts, tris, 4000, np.random.default_rng(0))
    assert pts.shape == (4000, 3) and pts.dtype == np.float32
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=1e-7)
    big = pts[:, 0] >= 5.0
    # area weighting: expect 8.0/8.5 of samples on the big triangle
    assert abs(big.mean() - 8.0 / 8.5) < 0.03
    # barycentric containment in each triangle
    small = pts[~big]
    assert (small[:, 0] >= 0).all() and (small[:, 1] >= 0).all()
    assert (small[:, 0] + small[:, 1] <= 1 + 1e-6).all()
    b = pts[big]
    assert ((b[:, 0] - 10) / 4 + b[:, 1] / 4 <= 1 + 1e-6).all()


def test_fid_txt_roundtrip_plot(tmp_path, monkeypatch):
    """A fid.txt written by the Trainer's writer parses and plots — including
    the random-init calibration stamp (the two sides previously met only in
    production; r2 verdict item 10)."""
    monkeypatch.delenv("CNG_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.delenv("CNG_LPIPS_WEIGHTS", raising=False)
    from conditioned_nerf_gan_tpu.eval.fid_evaluation import append_fid_line
    from conditioned_nerf_gan_tpu.tools.plots import plot_fid

    fid_path = tmp_path / "fid.txt"
    append_fid_line(fid_path, 4999, 120.5, 80.25, 0.41, 14.2)
    append_fid_line(fid_path, 9999, 90.0, 60.5, 0.33, 16.1)
    text = fid_path.read_text()
    assert text.startswith("# RANDOM-INIT FEATURES")  # uncalibrated stamp
    assert "9999 90.0" in text

    out = plot_fid(tmp_path)
    assert out.exists() and out.stat().st_size > 0


def test_prepare_data_orchestrator(tmp_path):
    """prepare_data rebuilds pcl/voxel/.lst from a bare render tree and the
    result loads through ShapeNetDataset (r2 verdict, Missing #4)."""
    from conditioned_nerf_gan_tpu.data import ShapeNetDataset
    from conditioned_nerf_gan_tpu.tools.prepare_data import main

    root = make_synthetic_shapenet(
        tmp_path, n_cars=2, n_views=3, img_size=32, n_points=1024,
        voxel_resolutions=(32,),
    )
    # strip the derived artifacts, keeping only the "blender render" outputs
    for lst in root.parent.glob("*.lst"):
        lst.unlink()
    for car in root.iterdir():
        if not car.is_dir():
            continue
        for derived in ("pcl_color.npy", "voxel.npz", "voxel_32.npz"):
            (car / derived).unlink(missing_ok=True)

    rc = main([str(root), "--skip_render", "--views", "3",
               "--pcl_size", "512", "--pcl_img_size", "32",
               "--resolutions", "32"])
    assert rc == 0
    assert (root.parent / "twenty.lst").exists()
    assert (root.parent / "val.lst").exists()
    for car in sorted(p for p in root.iterdir() if p.is_dir()):
        assert (car / "pcl_color.npy").exists()
        assert (car / "voxel_32.npz").exists()

    meta = {"num_points_ratio": 0.5, "dataset": {}}
    ds = ShapeNetDataset(root, 32, "twenty", meta, load_voxel=True,
                         load_pcl=True, voxel_resolution=32,
                         load_depth=False, shuffle=False)
    s = ds[0]
    assert s["voxel"].shape == (32, 32, 32, 4)
    assert s["pcl"].shape == (256, 6)

    # idempotent: second run skips everything and still succeeds
    rc = main([str(root), "--skip_render", "--views", "3",
               "--pcl_size", "512", "--pcl_img_size", "32",
               "--resolutions", "32"])
    assert rc == 0


def test_prepare_data_excludes_failed_cars(tmp_path):
    """A car whose pcl/voxel stage fails must not reach the split lists —
    training with load_pcl/load_voxel would crash on the missing artifact
    (r3 review finding)."""
    from conditioned_nerf_gan_tpu.tools.prepare_data import main

    root = make_synthetic_shapenet(
        tmp_path, n_cars=3, n_views=3, img_size=32, n_points=1024,
        voxel_resolutions=(32,),
    )
    for lst in root.parent.glob("*.lst"):
        lst.unlink()
    cars = sorted(p for p in root.iterdir() if p.is_dir())
    for car in cars:
        for derived in ("pcl_color.npy", "voxel.npz", "voxel_32.npz"):
            (car / derived).unlink(missing_ok=True)
    # corrupt one car's depth so its pcl backprojection fails
    bad = cars[1]
    for npy in (bad / "depth").glob("*.npy"):
        npy.write_bytes(b"not a numpy file")

    rc = main([str(root), "--skip_render", "--views", "3",
               "--pcl_size", "512", "--pcl_img_size", "32",
               "--resolutions", "32"])
    assert rc == 1  # failure reported
    listed = (root.parent / "twenty.lst").read_text().split()
    assert bad.name not in listed
    assert len(listed) == 2


def test_video_grid_composition(tmp_path):
    """video_grid tiles N videos into an ncols grid, shortest-clip length
    (reference misc/video_grid.py)."""
    import cv2

    from conditioned_nerf_gan_tpu.tools.video_grid import video_grid

    h = w = 16
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    n_frames = [4, 3, 5]  # min = 3 governs the output length
    paths = []
    for i, (color, nf) in enumerate(zip(colors, n_frames)):
        p = tmp_path / f"clip{i}.mp4"
        vw = cv2.VideoWriter(str(p), cv2.VideoWriter_fourcc(*"mp4v"), 4, (w, h))
        frame = np.zeros((h, w, 3), np.uint8)
        frame[:] = color
        for _ in range(nf):
            vw.write(frame)
        vw.release()
        paths.append(p)

    out = video_grid(paths, tmp_path / "grid.mp4", ncols=2)
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 2 * w
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == 2 * h
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    assert len(frames) == min(n_frames)
    f0 = frames[0].astype(np.int32)
    # clip i lands at (row, col) = divmod(i, ncols); lossy codec → loose check
    for i, color in enumerate(colors):
        r, c = divmod(i, 2)
        cell = f0[r * h:(r + 1) * h, c * w:(c + 1) * w]
        assert np.argmax(cell.mean(axis=(0, 1))) == int(np.argmax(color))
    # the empty 4th cell stays black
    assert f0[h:, w:].mean() < 20


def test_submit_slurm_sbatch_and_snapshot(tmp_path):
    """write_sbatch snapshots the source (version.sh) and emits a requeueable
    script that trains from the snapshot (reference submitSlurmjob.py:20-157)."""
    from conditioned_nerf_gan_tpu.tools.submit_slurm import main, write_sbatch

    repo = tmp_path / "repo"
    (repo / "conditioned_nerf_gan_tpu").mkdir(parents=True)
    (repo / "conditioned_nerf_gan_tpu" / "__init__.py").write_text("# pkg\n")
    (repo / "train.py").write_text("print('train')\n")

    out = tmp_path / "run"
    sbatch = write_sbatch(out, name="smoke", time_limit="01:00:00",
                          train_args="--config dg_dis", repo_dir=repo)
    text = sbatch.read_text()
    assert "#SBATCH --requeue" in text          # idempotent-resume contract
    assert "--job-name=smoke" in text
    assert f"-o {out}" in text and "--config dg_dis" in text
    assert (out / "logs").is_dir()

    # the snapshot is a self-contained copy of the submitted code
    snapshot_dirs = [p for p in out.iterdir()
                     if p.is_dir() and p.name.startswith("source_")]
    assert len(snapshot_dirs) == 1
    snap = snapshot_dirs[0]
    assert f"cd {snap}" in text
    assert (snap / "train.py").read_text() == "print('train')\n"
    assert (snap / "conditioned_nerf_gan_tpu" / "__init__.py").exists()
    assert list(out.glob("source_*.tar.gz"))

    # CLI --dry_run writes without invoking sbatch
    out2 = tmp_path / "run2"
    main(["-o", str(out2), "--dry_run"])
    assert (out2 / "submit.sbatch").exists()
