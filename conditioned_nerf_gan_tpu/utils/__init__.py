"""Small host-side utilities (image grids, timers)."""

from .image import save_image_grid, to_uint8
from .cache import setup_compile_cache

__all__ = ["save_image_grid", "to_uint8", "setup_compile_cache"]
