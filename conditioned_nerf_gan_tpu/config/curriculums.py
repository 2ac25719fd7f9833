"""Dict-based curriculum system.

Parity target: reference configs/curriculums.py:84-152 and the curriculum
loading precedence of reference utils.py:191-228 / train.py:218-223.

Schema: integer keys are upsample milestones whose dicts override the
step-dependent hyperparameters (batch_size, img_size, num_steps, batch_split,
lrs, num_points_ratio, voxel_resolution, z_reg_weight); string keys are
globals. `extract_metadata(curriculum, step)` resolves the highest milestone
<= step plus all globals. Presets overlay as default ∘ special ∘ --config via
recursive deep-merge, and the resolved curriculum JSON round-trips with
integer keys restored (reference utils.py:39-50).

Deliberately resolved reference inconsistencies (SURVEY.md §2.3):
  * the default config base is the runnable "thousand" package (the reference
    CLI defaulted to a nonexistent `configs.thesis`);
  * stale experiment siren names (TALLSIREN_dg / SHORTSIREN_dg /
    DoubleSIREN_dg) are aliased to the renamed classes in `presets.ALIASES`;
  * hard-coded cluster paths are environment-overridable.
"""

from __future__ import annotations

import copy
import importlib
import json
from pathlib import Path


def extract_metadata(curriculum: dict, current_step: int) -> dict:
    """Resolve per-step hyperparameters (curriculums.py:120-134)."""
    out: dict = {}
    int_keys = sorted((k for k in curriculum if isinstance(k, int)), reverse=True)
    for key in int_keys:
        if key <= current_step:
            out.update(curriculum[key])
            break
    for key in curriculum:
        if not isinstance(key, int):
            out[key] = curriculum[key]
    return out


def next_upsample_step(curriculum: dict, current_step: int) -> float:
    """First future milestone that increases img_size (curriculums.py:84-94)."""
    current_size = extract_metadata(curriculum, current_step)["img_size"]
    for step in sorted(k for k in curriculum if isinstance(k, int)):
        if step > current_step and curriculum[step].get("img_size", 512) > current_size:
            return step
    return float("inf")


def last_upsample_step(curriculum: dict, current_step: int) -> int:
    """Start step of the current resolution stage (curriculums.py:97-108)."""
    current_size = extract_metadata(curriculum, current_step)["img_size"]
    for step in sorted(k for k in curriculum if isinstance(k, int)):
        if step <= current_step and curriculum[step].get("img_size") == current_size:
            return step
    return 0


def update_recursive(dict1: dict, dict2: dict) -> dict:
    """Deep-merge dict2 into dict1 (curriculums.py:137-152)."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {}
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v
    return dict1


def json_keys_to_int(x):
    """Restore integer milestone keys after a JSON round-trip (utils.py:39-50)."""
    def to_int(y):
        if isinstance(y, int):
            return y
        return int(y) if isinstance(y, str) and y.isdigit() else y

    if isinstance(x, dict):
        return {to_int(k): v for k, v in x.items()}
    return x


def curriculum_to_json(curriculum: dict, path: str | Path) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(curriculum, f, ensure_ascii=False, indent=4, default=str)


def curriculum_from_json(path: str | Path) -> dict:
    with open(path, "r") as f:
        return json.load(f, object_hook=json_keys_to_int)


def get_config_base(name: str = "thousand"):
    """Import a preset package exposing `default`, `special`, and experiments."""
    return importlib.import_module(
        f"conditioned_nerf_gan_tpu.config.presets.{name}"
    )


def load_curriculum(
    output_dir: str | Path | None = None,
    load_dir: str | Path | None = None,
    load_curriculum_path: str | Path | None = None,
    config_base: str = "thousand",
    config: str | None = None,
) -> dict:
    """Curriculum loading with the reference's precedence (utils.py:191-228):

    1. explicit --load_curriculum JSON
    2. <output_dir>/curriculum.json (Slurm-requeue resume)
    3. <load_dir>/../../curriculum.json (checkpoint's saved curriculum)
    4. preset overlay chain: base.default ∘ base.special ∘ base.<config>
    """
    if load_curriculum_path:
        return curriculum_from_json(load_curriculum_path)
    if output_dir and (Path(output_dir) / "curriculum.json").exists():
        return curriculum_from_json(Path(output_dir) / "curriculum.json")
    if load_dir and (Path(load_dir).parent.parent / "curriculum.json").exists():
        return curriculum_from_json(Path(load_dir).parent.parent / "curriculum.json")

    base = get_config_base(config_base)
    curriculum = update_recursive(
        copy.deepcopy(base.default), copy.deepcopy(base.special)
    )
    if config:
        curriculum = update_recursive(
            curriculum, copy.deepcopy(getattr(base, config))
        )
    return curriculum
