"""Real-data squeeze (r3 verdict item 7): train + eval on a tree whose
cameras, depth, point clouds, and voxels came from the EXPORTER pipeline
(tools/blender bpy-free math + real EXR depth files + backprojection +
voxelization) rather than make_synthetic_shapenet."""

import copy
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def exporter_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("exporter_fx")
    from conditioned_nerf_gan_tpu.tools.blender.fixture import make_exporter_fixture

    ds_root = make_exporter_fixture(root, n_cars=3, n_views=6, img_size=32)
    return root, ds_root


def test_backprojection_consistency(exporter_env):
    """The exporter's cameras.npz + EXR depth backproject onto the GT mesh
    surface (the reference's checkpos/reproject verification, SURVEY §4)."""
    from conditioned_nerf_gan_tpu.tools.blender.project import check_backprojection

    _, ds_root = exporter_env
    for car in ("car0000", "car0001"):
        d = check_backprojection(ds_root / car, views=6, img_size=32)
        assert d < 0.02, f"{car}: backprojection chamfer {d} — convention broken"


def test_depth_flows_through_exr_reader(exporter_env):
    """The dataset loader consumes the fixture's real RLE EXR depth files
    with the 65504→inf→0 background convention."""
    from conditioned_nerf_gan_tpu.data import ShapeNetDataset

    _, ds_root = exporter_env
    meta = {"num_points_ratio": 1.0}
    ds = ShapeNetDataset(str(ds_root), 32, "thousand", meta,
                         load_voxel=False, load_pcl=True, load_depth=True,
                         voxel_resolution=32)
    sample = ds[0]
    depth = sample["depth"]
    assert depth.shape == (32, 32)
    fg = depth[depth > 0]
    assert fg.size > 10, "no foreground depth decoded"
    assert 0.2 < float(fg.min()) and float(fg.max()) < 2.0, (
        "foreground depth outside the camera shell — EXR decode or "
        "convention broken"
    )
    assert float((depth == 0).mean()) > 0.1, "no background zeros"


def test_trainer_on_exporter_tree(exporter_env, monkeypatch):
    """Full Trainer (photo + DEPTH loss, GAN) + one FID eval pass over the
    exporter-produced tree: the depth loss consumes EXR depth through the
    loader, eval renders pair against the exporter's val views."""
    root, ds_root = exporter_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    monkeypatch.setenv("CNG_EVAL_IMAGES", str(root / "EvalImages"))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.config import curriculum_to_json, load_curriculum
    from conditioned_nerf_gan_tpu.training import Trainer

    curriculum = copy.deepcopy(load_curriculum(config_base="smoke"))
    for k in [k for k in curriculum if isinstance(k, int) and k > 0]:
        curriculum.pop(k)
    curriculum[0]["batch_size"] = 4
    curriculum[0]["img_size"] = 16
    curriculum[0]["num_steps"] = 8
    curriculum["dataset"] = dict(curriculum["dataset"], path=str(ds_root),
                                 load_depth=True)
    curriculum["depth_loss"] = True
    curriculum["sample_img_size"] = 16
    curriculum["sample_num_steps"] = 8
    curriculum["fid"] = {"subset": "val", "target_size": 32}

    out = root / "run"
    out.mkdir(exist_ok=True)
    curriculum_to_json(curriculum, out / "curriculum.json")
    args = types.SimpleNamespace(
        output_dir=str(out), load_dir="", load_curriculum="",
        sampling_interval=2, print_freq=100, eval_freq=3,
        n_epochs=100, stop_step=3, config=None, config_base="smoke", seed=0,
    )
    trainer = Trainer(args)
    trainer.load_models()
    trainer.train()
    trainer._flush_metrics()

    assert trainer.histories["photometry_losses"], "no photo losses"
    assert trainer.histories["depth_losses"], "depth loss never computed"
    assert all(np.isfinite(trainer.histories["photometry_losses"]))
    assert all(np.isfinite(trainer.histories["depth_losses"]))
    # the eval pass ran against the exporter tree and logged metrics
    fid_log = out / "fid.txt"
    assert fid_log.exists(), "evaluate() never produced fid.txt"
    assert fid_log.read_text().strip(), "fid.txt empty"
    assert list((out / "samples" / "valview").glob("*.png"))
