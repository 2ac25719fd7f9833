"""Evaluation stack: FID / oFID / LPIPS / PSNR + the in-training eval loop."""

from .metrics import (
    frechet_distance,
    newton_schulz_sqrt_trace,
    compute_psnr,
    compute_fid_from_dirs,
    compute_metrics_from_dirs,
)
from .inception import InceptionV3Features
from .lpips import LPIPS
from .fid_evaluation import (
    setup_evaluation,
    output_images,
    evaluate_trainer,
)

__all__ = [
    "frechet_distance",
    "newton_schulz_sqrt_trace",
    "compute_psnr",
    "compute_fid_from_dirs",
    "compute_metrics_from_dirs",
    "InceptionV3Features",
    "LPIPS",
    "setup_evaluation",
    "output_images",
    "evaluate_trainer",
]
