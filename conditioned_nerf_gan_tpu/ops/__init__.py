"""Pure-jnp rendering primitives (layer L1 of the framework).

Behavioral parity targets are cited per-function into the reference repo
(`/root/reference/generators/volumetric_rendering.py` et al.); the
implementations here are TPU-first: static shapes, batched einsums, scans, and
gather-based interpolation that XLA tiles onto the MXU/VPU.
"""

from .rays import (
    normalize_vecs,
    pixel_rays,
    get_initial_rays,
    perturb_points,
    transform_rays,
    sample_camera_positions,
    create_cam2world_matrix,
    create_world2cam_matrix,
    xyz2angles,
    distance2depth,
)
from .integration import volume_integrate
from .sampling import sample_pdf, merge_sorted_samples
from .grid_sample import grid_sample_3d, trilinear_point_features
from .fastmath import fast_sin

__all__ = [
    "normalize_vecs",
    "pixel_rays",
    "get_initial_rays",
    "perturb_points",
    "transform_rays",
    "sample_camera_positions",
    "create_cam2world_matrix",
    "create_world2cam_matrix",
    "xyz2angles",
    "distance2depth",
    "volume_integrate",
    "sample_pdf",
    "merge_sorted_samples",
    "grid_sample_3d",
    "trilinear_point_features",
    "fast_sin",
]
