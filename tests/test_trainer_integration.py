"""End-to-end Trainer integration test (tiny synthetic run on CPU)."""

import types

import numpy as np
import pytest

from conditioned_nerf_gan_tpu.data import make_synthetic_shapenet


@pytest.fixture(scope="module")
def train_env(tmp_path_factory, monkeypatch=None):
    root = tmp_path_factory.mktemp("trainer_it")
    ds_root = make_synthetic_shapenet(
        root / "data", n_cars=3, n_views=4, img_size=32, n_points=512,
        voxel_resolutions=(32,),
    )
    return root, ds_root


def _args(out_dir, **overrides):
    base = dict(
        output_dir=str(out_dir), load_dir="", load_curriculum="",
        sampling_interval=3, print_freq=100, eval_freq=1000,
        n_epochs=100, stop_step=4, config=None, config_base="smoke",
        seed=0,
    )
    base.update(overrides)
    return types.SimpleNamespace(**base)


def test_trainer_end_to_end(train_env, monkeypatch):
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    # re-import the smoke preset so it picks up the env path
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)

    from conditioned_nerf_gan_tpu.training import Trainer

    out = root / "run"
    trainer = Trainer(_args(out))
    trainer.load_models()
    trainer.train()

    # artifacts: final checkpoint + sample grids + curriculum persistence
    ckpts = list((out / "checkpoints").glob("*.ckpt"))
    assert ckpts, "no checkpoint written"
    assert (out / "curriculum.json").exists()
    assert (out / "train_spec.txt").exists()
    samples = list((out / "samples" / "valview").glob("*.png"))
    assert samples, "no sample grids written"
    assert trainer.histories["photometry_losses"], "no losses recorded"
    assert all(np.isfinite(trainer.histories["photometry_losses"]))

    # resume continues from the saved step with histories intact
    trainer2 = Trainer(_args(out, stop_step=6))
    trainer2.load_models()
    assert trainer2.step >= 4
    n_before = len(trainer2.histories["photometry_losses"])
    trainer2.train()
    assert len(trainer2.histories["photometry_losses"]) > n_before
