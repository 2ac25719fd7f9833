"""Curriculum/config system tests (reference configs/curriculums.py semantics)."""

import json

import pytest

from conditioned_nerf_gan_tpu.config import (
    curriculum_from_json,
    curriculum_to_json,
    extract_metadata,
    json_keys_to_int,
    last_upsample_step,
    load_curriculum,
    next_upsample_step,
    update_recursive,
)
from conditioned_nerf_gan_tpu.config.presets import resolve_siren_alias


def test_load_thousand_special_overlay():
    cur = load_curriculum(config_base="thousand")
    meta0 = extract_metadata(cur, 0)
    # special.py overrides default.py batch sizes (special.py:12-30).
    # batch_split is the TPU memory knob (measured per-stage); dynamics
    # parity with the reference's split 2/6/6/6 is held by grad_accum_scale.
    assert meta0["batch_size"] == 24 and meta0["grad_accum_scale"] == 2
    assert meta0["img_size"] == 32 and meta0["num_steps"] == 48
    assert meta0["generator"]["siren_type"] == "SHORTSIREN"
    assert meta0["photo_loss"] is True
    assert meta0["ray_start"] == 0.25 and meta0["ray_end"] == 1.95

    meta1 = extract_metadata(cur, 7000)
    assert meta1["img_size"] == 64 and meta1["batch_size"] == 12
    assert meta1["grad_accum_scale"] == 6
    meta3 = extract_metadata(cur, 30000)
    assert meta3["img_size"] == 128 and meta3["num_steps"] == 48  # special overrides 64
    assert meta3["ray_chunks"] == 16 and meta3["batch_size"] % meta3["batch_split"] == 0


def test_experiment_config_overlay():
    cur = load_curriculum(config_base="thousand", config="dg_dis")
    meta = extract_metadata(cur, 0)
    assert meta["enable_discriminator"] is True
    assert meta["generator"]["siren_type"] == "TALLSIREN_dg"
    assert resolve_siren_alias(meta["generator"]["siren_type"]) == "TALLSIREN_FG"
    assert meta["dataset"]["load_voxel"] is True


def test_upsample_steps():
    cur = load_curriculum(config_base="thousand")
    assert next_upsample_step(cur, 0) == 5000
    assert next_upsample_step(cur, 5000) == 15000
    assert next_upsample_step(cur, 30000) == float("inf")
    assert last_upsample_step(cur, 4999) == 0
    assert last_upsample_step(cur, 20000) == 15000
    # stage 3 keeps img_size 128 → last upsample stays at 15000
    assert last_upsample_step(cur, 30000) == 15000


def test_json_roundtrip(tmp_path):
    cur = load_curriculum(config_base="thousand")
    path = tmp_path / "curriculum.json"
    curriculum_to_json(cur, path)
    restored = curriculum_from_json(path)
    assert sorted(k for k in restored if isinstance(k, int)) == [0, 5000, 15000, 25000]
    assert extract_metadata(restored, 0)["img_size"] == 32


def test_curriculum_precedence(tmp_path):
    """output_dir/curriculum.json wins over the preset chain (utils.py:191-228)."""
    cur = load_curriculum(config_base="thousand")
    cur["marker"] = "saved"
    out_dir = tmp_path / "run"
    out_dir.mkdir()
    curriculum_to_json(cur, out_dir / "curriculum.json")
    loaded = load_curriculum(output_dir=out_dir, config_base="thousand")
    assert loaded["marker"] == "saved"

    explicit = tmp_path / "explicit.json"
    cur["marker"] = "explicit"
    curriculum_to_json(cur, explicit)
    loaded = load_curriculum(
        output_dir=out_dir, load_curriculum_path=explicit, config_base="thousand"
    )
    assert loaded["marker"] == "explicit"


def test_update_recursive_deep_merge():
    a = {"x": 1, "nested": {"a": 1, "b": 2}}
    b = {"nested": {"b": 3, "c": 4}, "y": 5}
    out = update_recursive(a, b)
    assert out["nested"] == {"a": 1, "b": 3, "c": 4}
    assert out["x"] == 1 and out["y"] == 5


def test_carla_preset_loads():
    from conditioned_nerf_gan_tpu.config.presets.carla import CARLA

    meta = extract_metadata(CARLA, 60000)
    assert meta["img_size"] == 128 and meta["batch_size"] == 10
    assert meta["discriminator"] == "ProgressiveEncoderDiscriminator"


def test_thousand_preset_tpu_policy_defaults():
    """The shipped TPU policy: bf16 compute + fast_sin + the fused Pallas
    kernel are all on by default (each self-gates off-TPU / under fp32
    overrides), at every curriculum stage."""
    cur = load_curriculum(config_base="thousand")
    for step in (0, 5001, 15001, 25001):
        meta = extract_metadata(cur, step)
        assert meta["compute_dtype"] == "bfloat16", step
        assert meta["use_fast_sin"] is True, step
        assert meta["use_pallas"] is True, step


def test_every_curriculum_key_documented():
    """Two-way drift test for CURRICULUM_KEY_DOCS (r3 verdict item 5):
    every key consumed by the package or shipped in a preset must be
    documented, and every documented key must still be in use."""
    import copy
    import dataclasses
    import re
    from pathlib import Path

    from conditioned_nerf_gan_tpu.config.curriculums import (
        CURRICULUM_KEY_DOCS,
        get_config_base,
    )
    from conditioned_nerf_gan_tpu.models.generator import RenderConfig
    from conditioned_nerf_gan_tpu.training.train_step import TrainStepConfig

    pkg = Path(__file__).resolve().parent.parent
    sources = sorted((pkg / "conditioned_nerf_gan_tpu").rglob("*.py"))
    sources += [pkg / "train.py", pkg / "inference.py"]
    text = "\n".join(p.read_text() for p in sources)

    used: set[str] = set()
    # metadata["k"] / metadata.get("k" / meta["k"] / meta.get("k"
    flat = re.compile(
        r"""\bmeta(?:data)?(?:\[["']([a-zA-Z_0-9]+)["']\]|\.get\(["']([a-zA-Z_0-9]+)["'])"""
    )
    # metadata["block"]["k"] / metadata["block"].get("k"
    nested = re.compile(
        r"""\bmeta(?:data)?\[["'](generator|unet|dataset|fid)["']\]"""
        r"""(?:\[["']([a-zA-Z_0-9]+)["']\]|\.get\(["']([a-zA-Z_0-9]+)["'])"""
    )
    for m in flat.finditer(text):
        used.add(m.group(1) or m.group(2))
    for m in nested.finditer(text):
        used.add(f"{m.group(1)}.{m.group(2) or m.group(3)}")
    # the generator block is consumed through a local binding
    # (gen_meta = dict(metadata["generator"]) in trainer/inference)
    gen_local = re.compile(
        r"""\bgen_meta(?:\[["']([a-zA-Z_0-9]+)["']\]|\.get\(["']([a-zA-Z_0-9]+)["'])"""
    )
    for m in gen_local.finditer(text):
        used.add(f"generator.{m.group(1) or m.group(2)}")
    # RenderConfig picks fields from metadata by name
    used |= {f.name for f in dataclasses.fields(RenderConfig)}
    # every key shipped in a preset
    blocks = ("generator", "unet", "dataset", "fid")

    def collect(d):
        for k, v in d.items():
            if isinstance(k, int):
                collect(v)
            elif k in blocks and isinstance(v, dict):
                used.add(k)
                used.update(f"{k}.{kk}" for kk in v)
            else:
                used.add(k)

    for base_name in ("thousand", "smoke", "carla"):
        if base_name == "carla":
            from conditioned_nerf_gan_tpu.config.presets.carla import CARLA

            collect(copy.deepcopy(CARLA))
            continue
        base = get_config_base(base_name)
        for name in dir(base):
            val = getattr(base, name)
            if isinstance(val, dict) and not name.startswith("_"):
                collect(copy.deepcopy(val))

    # nested-block names themselves and intermediate keys are fine; a
    # handful of regex hits are not curriculum keys (dict literals in
    # unrelated modules that happen to bind a var named meta)
    not_curriculum = {
        "loader_state",  # checkpoint history key read via histories.get
    }
    used -= not_curriculum

    undocumented = sorted(k for k in used if k not in CURRICULUM_KEY_DOCS)
    assert not undocumented, (
        f"curriculum keys consumed or shipped but not documented in "
        f"CURRICULUM_KEY_DOCS: {undocumented}"
    )
    stale = sorted(k for k in CURRICULUM_KEY_DOCS if k not in used)
    assert not stale, (
        f"CURRICULUM_KEY_DOCS documents keys no longer consumed or shipped: "
        f"{stale}"
    )

    # field names of the config dataclasses that mirror metadata keys must
    # keep their docs in sync too (a renamed field would show above)
    tsc_fields = {f.name for f in dataclasses.fields(TrainStepConfig)}
    assert "render" in tsc_fields  # sanity: the dataclass shape is intact


def test_build_stage_bench_families():
    """The shared bench workload builder (bench.py + scripts/bench_train_step)
    resolves siren aliases and picks voxel-vs-pcl conditioning per preset
    (r4 review: bench.py's private copy silently lacked both)."""
    from conditioned_nerf_gan_tpu.utils.bench_setup import build_stage_bench

    gen, enc, disc, cfg, batch, meta = build_stage_bench(stage=0)
    assert "pcl" in batch and disc is not None
    assert type(enc).__name__ == "ResnetPointnet"
    assert batch["img"].shape[0] == meta["batch_size"]

    gen, enc, disc, cfg, batch, meta = build_stage_bench(
        stage=1, config="dg_shortsiren_dis")
    assert "voxel" in batch and "pcl" not in batch
    assert gen.siren_type == "SHORTSIREN_FG"  # stale reference name resolved
    vres = meta.get("voxel_resolution", 64)
    assert batch["voxel"].shape[1:] == (vres, vres, vres, 4)

    # override + pallas-force knobs used by the ablation CLI
    g2, _, d2, cfg2, _, m2 = build_stage_bench(
        stage=0, meta_overrides={"enable_discriminator": False,
                                 "batch_size": 2},
        force_pallas=False)
    assert d2 is None and m2["batch_size"] == 2 and not g2.use_pallas
