"""Pallas TPU kernels for the hot point-evaluation path."""

from .film_siren import film_siren_mlp, film_siren_mlp_reference

__all__ = ["film_siren_mlp", "film_siren_mlp_reference"]
