"""Inference runtime: images / video / pcl / voxel export / metrics / interpolation."""

from .extract_shapes import create_samples, sample_sigma_grid
from .mrc import write_mrc
from .inference import Inferencer, perturb_extrinsics

__all__ = [
    "create_samples",
    "sample_sigma_grid",
    "write_mrc",
    "Inferencer",
    "perturb_extrinsics",
]
