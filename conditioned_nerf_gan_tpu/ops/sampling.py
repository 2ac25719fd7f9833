"""Hierarchical (importance) sampling: inverse-CDF resampling + coarse/fine merge.

Parity targets:
  - `sample_pdf`: reference generators/volumetric_rendering.py:297-342
  - coarse/fine sort-merge: reference generators/generators.py:163-167

TPU-first design (numbers from TPU v5e at 2×128²×48 rays):
  * Inverse-CDF: `torch.searchsorted` + 4 `torch.gather`s become one dense
    compare mask plus masked max/min *reductions* — both the CDF and the bin
    edges are monotone in the same index order, so "value at the searchsorted
    index" equals "masked extremum", bit-exactly. 85 ms → 3.4 ms (25×) vs the
    gather formulation; no data-dependent memory access at all.
  * Coarse/fine merge: a multi-operand `lax.sort` along the minor (lane)
    axis, co-sorting z with each channel. The original torch-style
    argsort-then-gather along a middle axis with a trailing unit dim costs
    240 ms; this costs 5 ms (48×).
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
      bins:    (R, S+1) bin edges (z-mid values), monotone increasing
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

    # "below = searchsorted(cdf, u) - 1" etc. as masked extrema: cdf and bins
    # are monotone in the same order, so the value at the left/right neighbor
    # index is the masked max/min over {cdf < u} / {cdf >= u}.
    mask = cdf[:, None, :] < u[:, :, None]  # (R, U, S+1)
    neg, pos = -jnp.inf, jnp.inf
    cdf_lo = jnp.max(jnp.where(mask, cdf[:, None, :], neg), axis=-1)
    bin_lo = jnp.max(jnp.where(mask, bins[:, None, :], neg), axis=-1)
    cdf_hi = jnp.min(jnp.where(mask, pos, cdf[:, None, :]), axis=-1)
    bin_hi = jnp.min(jnp.where(mask, pos, bins[:, None, :]), axis=-1)

    # empty-set fallbacks = the index clamps of the reference (:325-326):
    # u <= cdf[0]=0 → left neighbor is index 0; u beyond cdf[-1] (fp edge)
    # → right neighbor clamps to the last entry.
    cdf_lo = jnp.maximum(cdf_lo, 0.0)
    bin_lo = jnp.where(jnp.isfinite(bin_lo), bin_lo, bins[:, :1])
    cdf_hi = jnp.where(jnp.isfinite(cdf_hi), cdf_hi, cdf[:, -1:])
    bin_hi = jnp.where(jnp.isfinite(bin_hi), bin_hi, bins[:, -1:])

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < eps, 1.0, denom)
    return bin_lo + (u - cdf_lo) / denom * (bin_hi - bin_lo)


def merge_sorted_samples(
    outputs_a: jax.Array,
    z_a: jax.Array,
    outputs_b: jax.Array,
    z_b: jax.Array,
):
    """Concatenate two per-ray sample sets and sort by depth.

    Matches reference generators.py:163-167 (fine first, then coarse, stable
    sort over the combined z). Shapes: outputs (B, R, S, C), z (B, R, S, 1);
    returns the merged (B, R, 2S, C) and (B, R, 2S, 1).

    Implemented as a single multi-operand `lax.sort` along the minor axis,
    co-sorting each channel with the key — no argsort/gather round trip.
    """
    all_outputs = jnp.concatenate([outputs_a, outputs_b], axis=-2)
    all_z = jnp.concatenate([z_a, z_b], axis=-2)
    out_z, out = _cosort(all_z[..., 0], all_outputs)
    return out, out_z[..., None]


@jax.custom_vjp
def _cosort(z, outputs):
    """Sort samples by depth, co-sorting the value channels.

    Custom VJP: XLA differentiates `lax.sort` through a scatter, which is
    latency-bound per element on TPU and costs ~450 ms per stage-2 G-step
    backward (measured v5e-1, 18.9M samples). Unsorting is itself a sort:
    co-sorting the cotangents with the forward permutation as the key puts
    every cotangent back at its pre-sort position (sorting `perm` ascending
    is the inverse permutation applied to the carried operands). One more
    lane-axis multi-operand sort (~5 ms/render) replaces both the scatter
    AND the earlier take_along_axis gather formulation (~200 ms/step).
    """
    return _cosort_fwd(z, outputs)[0]


def _cosort_fwd(z, outputs):
    channels = outputs.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, z.shape, z.ndim - 1)
    operands = (z, iota) + tuple(outputs[..., c] for c in range(channels))
    sorted_ops = jax.lax.sort(operands, dimension=-1, num_keys=1, is_stable=True)
    z_s, perm = sorted_ops[0], sorted_ops[1]
    out_s = jnp.stack(sorted_ops[2:], axis=-1)
    return (z_s, out_s), perm


def _cosort_bwd(perm, cotangents):
    gz, gout = cotangents
    channels = gout.shape[-1]
    operands = (perm, gz) + tuple(gout[..., c] for c in range(channels))
    unsorted = jax.lax.sort(operands, dimension=-1, num_keys=1, is_stable=True)
    gz_in = unsorted[1]
    gout_in = jnp.stack(unsorted[2:], axis=-1)
    return gz_in, gout_in


_cosort.defvjp(_cosort_fwd, _cosort_bwd)
