"""Checkpoint save/restore with newest-checkpoint auto-resume.

Parity target: reference utils.py:287-311 (resume precedence: newest
checkpoint in output_dir/checkpoints → explicit load path → fresh init) and
utils.py:463-501 (single-file per-step checkpoints holding model + optimizer
state + loss histories; the step counter re-derives every schedule).

Format: one msgpack file per step (`{step}.ckpt`, flax.serialization of the
TrainState pytree) plus a sidecar `{step}.json` with loss histories — the
functional analogue of the reference's torch .tar dict.

Compatibility: full restore targets the *current* TrainState template, so
the optimizer-state pytree must structurally match the optax chain that
wrote the checkpoint — Trainer auto-resume across a chain change (like the
r2 mapping-lr/coupled-decay rework) raises a structure mismatch rather than
resuming silently wrong. Inference uses `params_only=True`, which survives
such changes (it never needs the optimizer state).
"""

from __future__ import annotations

import json
import warnings
from pathlib import Path
from typing import Any

import jax
from flax import serialization


def find_newest_checkpoint(ckpt_dir: str | Path) -> Path | None:
    """Highest-step `*.ckpt` in the directory (utils.py:85-93)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    candidates = [p for p in ckpt_dir.glob("*.ckpt") if p.stem.isdigit()]
    if not candidates:
        return None
    return max(candidates, key=lambda p: int(p.stem))


def save_checkpoint(
    ckpt_dir: str | Path, step: int, state: Any, histories: dict | None = None
) -> Path:
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    path = ckpt_dir / f"{step}.ckpt"
    host_state = jax.device_get(state)
    path.write_bytes(serialization.to_bytes(host_state))
    if histories is not None:
        (ckpt_dir / f"{step}.json").write_text(json.dumps(histories))
    return path


def restore_checkpoint(path: str | Path, template_state: Any,
                       params_only: bool = False):
    """Restore into a structurally-identical template TrainState.

    `params_only=True` restores just the model param subtrees (params_G/E/D),
    keeping the template's fresh optimizer state — tolerant of checkpoints
    written by a different optax chain composition (inference never needs the
    optimizer state).

    Returns (state, histories) — histories {} if no sidecar exists.
    """
    path = Path(path)
    if params_only:
        raw = serialization.msgpack_restore(path.read_bytes())
        state = template_state
        for name in ("params_G", "params_E", "params_D"):
            tmpl = getattr(template_state, name)
            if tmpl is None:
                continue
            if raw.get(name) is None:
                # A template expecting this subtree but a checkpoint lacking
                # it means truncation or a model/checkpoint mismatch — using
                # the template's fresh random params would silently corrupt
                # inference, so be loud about it.
                warnings.warn(
                    f"{path}: checkpoint has no '{name}' subtree; keeping the"
                    " template's freshly-initialized params for it",
                    stacklevel=2,
                )
                continue
            restored = serialization.from_state_dict(tmpl, raw[name],
                                                     name=name)
            state = state.replace(**{name: restored})
        if "step" in raw:
            state = state.replace(
                step=serialization.from_state_dict(template_state.step,
                                                   raw["step"], name="step")
            )
    else:
        state = serialization.from_bytes(template_state, path.read_bytes())
    sidecar = path.with_suffix(".json")
    histories = json.loads(sidecar.read_text()) if sidecar.exists() else {}
    return state, histories
