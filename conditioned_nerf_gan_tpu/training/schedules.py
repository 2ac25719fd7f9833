"""Step-function schedules (all pure functions of the step counter).

Parity target: reference utils.py:610-618 — fade-in alpha ramps linearly over
`fade_steps` from the stage's last upsample milestone; NeRF density noise
decays 1 → 0 over the first 5000 steps. Both are traced scalars so per-step
changes never recompile the train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def fade_alpha(step, step_last_upsample, fade_steps):
    """ProGAN fade-in alpha in [0, 1] (utils.py:610-617)."""
    return jnp.minimum(1.0, (step - step_last_upsample) / fade_steps)


def nerf_noise_schedule(step):
    """Density-noise stddev: max(0, 1 - step/5000) (utils.py:618)."""
    return jnp.maximum(0.0, 1.0 - step / 5000.0)
