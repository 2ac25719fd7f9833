"""Host-side data pipeline: ShapeNet reader, loaders, synthetic fixtures."""

from .shapenet import ShapeNetDataset, DataLoader, get_dataloader, sample_cond
from .exr import read_exr_depth
from .synthetic import make_synthetic_shapenet

__all__ = [
    "ShapeNetDataset",
    "DataLoader",
    "get_dataloader",
    "sample_cond",
    "read_exr_depth",
    "make_synthetic_shapenet",
]
