"""Hierarchical (importance) sampling: inverse-CDF resampling + coarse/fine merge.

Parity targets:
  - `sample_pdf`: reference generators/volumetric_rendering.py:297-342
  - coarse/fine sort-merge: reference generators/generators.py:163-167

TPU-first notes: instead of `torch.searchsorted` (a data-dependent binary
search), the CDF inversion is a dense rank computation —
``inds = sum(cdf < u)`` over the (small, static) sample axis — which the VPU
executes as a single broadcast-compare-reduce with no divergent control flow.
The 2S coarse+fine merge uses a single `argsort` along the static sample axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(
    bins: jax.Array,
    weights: jax.Array,
    n_importance: int,
    *,
    det: bool = False,
    key: jax.Array | None = None,
    uniforms: jax.Array | None = None,
    eps: float = 1e-5,
) -> jax.Array:
    """Draw `n_importance` samples per ray from the piecewise-constant PDF.

    Args:
      bins:    (R, S+1) bin edges (z-mid values)
      weights: (R, S) unnormalized bin weights
      det:     deterministic (linspace) vs stochastic u
      key / uniforms: PRNG key, or explicit (R, n_importance) uniforms for
        parity testing
    Returns (R, n_importance) sampled z values (unsorted, as in the reference).
    """
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (R, S+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_importance, dtype=cdf.dtype)
        u = jnp.broadcast_to(u[None], (n_rays, n_importance))
    elif uniforms is not None:
        u = uniforms
    else:
        if key is None:
            raise ValueError("sample_pdf needs a key (or uniforms) when det=False")
        u = jax.random.uniform(key, (n_rays, n_importance), dtype=cdf.dtype)

    # searchsorted(side='left') == count of cdf entries strictly below u.
    # Dense compare-reduce over the static sample axis (VPU-friendly).
    inds = jnp.sum(cdf[:, None, :] < u[:, :, None], axis=-1)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, n_bins)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bins_lo = jnp.take_along_axis(bins, below, axis=-1)
    bins_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_lo + (u - cdf_lo) / denom * (bins_hi - bins_lo)


def merge_sorted_samples(
    outputs_a: jax.Array,
    z_a: jax.Array,
    outputs_b: jax.Array,
    z_b: jax.Array,
):
    """Concatenate two per-ray sample sets and sort by depth.

    Matches reference generators.py:163-167 (fine first, then coarse, then a
    stable sort over the combined z). Shapes: outputs (B, R, S, C),
    z (B, R, S, 1); returns the merged (B, R, 2S, C) and (B, R, 2S, 1).
    """
    all_outputs = jnp.concatenate([outputs_a, outputs_b], axis=-2)
    all_z = jnp.concatenate([z_a, z_b], axis=-2)
    order = jnp.argsort(all_z, axis=-2, stable=True)
    all_z = jnp.take_along_axis(all_z, order, axis=-2)
    all_outputs = jnp.take_along_axis(
        all_outputs, jnp.broadcast_to(order, (*order.shape[:-1], all_outputs.shape[-1])),
        axis=-2,
    )
    return all_outputs, all_z
