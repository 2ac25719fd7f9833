"""Small host-side utilities (image grids, timers)."""

from .image import save_image_grid, to_uint8

__all__ = ["save_image_grid", "to_uint8"]
