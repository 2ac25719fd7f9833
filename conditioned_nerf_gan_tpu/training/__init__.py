"""Training runtime: losses, jitted train step, schedules, Trainer shell."""

from .losses import (
    z_sampler,
    gan_g_loss,
    gan_d_loss,
    photometric_loss,
    depth_loss,
    geometry_loss,
    r1_penalty,
)
from .schedules import fade_alpha, nerf_noise_schedule
from .train_step import (
    TrainStepConfig,
    TrainState,
    create_train_state,
    make_train_step,
    make_optimizer,
)
try:  # Trainer shell lands after the step function layer
    from .trainer import Trainer
except ImportError:  # pragma: no cover
    Trainer = None

__all__ = [
    "z_sampler",
    "gan_g_loss",
    "gan_d_loss",
    "photometric_loss",
    "depth_loss",
    "geometry_loss",
    "r1_penalty",
    "fade_alpha",
    "nerf_noise_schedule",
    "TrainStepConfig",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_optimizer",
    "Trainer",
]
