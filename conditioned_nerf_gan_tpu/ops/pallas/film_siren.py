"""Fused FiLM-SIREN MLP point-evaluation kernel (Pallas / Mosaic).

The hot loop of the whole framework (SURVEY §3.1): millions of ray sample
points per image through an L-layer FiLM-SIREN —
    h_0 = sin(freq_0 ⊙ (x W_0 + b_0) + phase_0)
    h_l = sin(freq_l ⊙ (h_{l-1} W_l + b_l) + phase_l)
    out = h_{L-1} W_f + b_f                                (rgb+sigma, 4 ch)
with per-batch-element freq/phase vectors (reference generators/siren.py:146-160
applied in the stacks at :1210-1224 etc.).

Why a kernel: under plain XLA each layer's (N, 256) activations round-trip
through HBM (~13 GB per 128² hierarchical render) and the sin() epilogues are
separate VPU passes. This kernel blocks over points and keeps the entire
layer stack's activations in VMEM — weights (4×256×256 ≈ 1 MB) stay resident,
each point tile is loaded once and only the 4-channel output is written back.

Gradients: `film_siren_mlp` carries a custom VJP whose backward recomputes
through the pure-jnp reference implementation (rematerialized XLA autodiff) —
forward-path speed for inference/eval/D-step generation, bit-consistent
gradients for training.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fastmath import fast_sin

# output channels padded to one sublane tile for efficient stores
_OUT_PAD = 8


def film_siren_mlp_reference(points, freq, phase, w0, b0, ws, bs, wf, bf):
    """Pure-jnp reference (the unfused XLA path). Shapes:
    points (B, N, Din); freq/phase (B, L*H); w0 (Din, H); b0 (H);
    ws (L-1, H, H); bs (L-1, H); wf (H, 4); bf (4) → (B, N, 4).
    """
    L = 1 + ws.shape[0]
    H = w0.shape[1]
    h = jnp.einsum("bnd,dh->bnh", points, w0) + b0
    h = jnp.sin(freq[:, None, 0:H] * h + phase[:, None, 0:H])
    for l in range(L - 1):
        h = jnp.einsum("bnh,hk->bnk", h, ws[l]) + bs[l]
        lo, hi = (l + 1) * H, (l + 2) * H
        h = jnp.sin(freq[:, None, lo:hi] * h + phase[:, None, lo:hi])
    return jnp.einsum("bnh,hc->bnc", h, wf) + bf


def _kernel(points_ref, freq_ref, phase_ref, w0_ref, b0_ref, ws_ref, bs_ref,
            wf_ref, bf_ref, out_ref, *, num_layers: int, hidden: int,
            matmul_dtype):
    b = pl.program_id(0)
    x = points_ref[...]  # (BLK, Din)
    f = freq_ref[b]      # (L*H,)
    p = phase_ref[b]
    # matmuls run with `matmul_dtype` operands and fp32 accumulation; the
    # FiLM affine + sin stay fp32 (sin(freq·x) needs fp32 argument precision)
    h = jnp.dot(
        x.astype(matmul_dtype), w0_ref[...].astype(matmul_dtype),
        preferred_element_type=jnp.float32,
    ) + b0_ref[0]
    h = fast_sin(f[0:hidden] * h + p[0:hidden])
    for l in range(num_layers - 1):
        h = jnp.dot(
            h.astype(matmul_dtype), ws_ref[l].astype(matmul_dtype),
            preferred_element_type=jnp.float32,
        ) + bs_ref[l]
        lo, hi = (l + 1) * hidden, (l + 2) * hidden
        h = fast_sin(f[lo:hi] * h + p[lo:hi])
    out = jnp.dot(
        h.astype(matmul_dtype), wf_ref[...].astype(matmul_dtype),
        preferred_element_type=jnp.float32,
    ) + bf_ref[0]
    out_ref[...] = out


def _forward_pallas(points, freq, phase, w0, b0, ws, bs, wf, bf,
                    block_points: int = 2048, matmul_dtype=jnp.bfloat16):
    B, N, din = points.shape
    L = 1 + ws.shape[0]
    H = w0.shape[1]
    C = wf.shape[1]

    # pad N to a block multiple; pad the final projection to a full sublane
    n_pad = -N % block_points
    pts = jnp.pad(points, ((0, 0), (0, n_pad), (0, 0))) if n_pad else points
    Np = N + n_pad
    wf_p = jnp.pad(wf, ((0, 0), (0, _OUT_PAD - C)))
    bf_p = jnp.pad(bf, (0, _OUT_PAD - C))[None]

    pts2 = pts.reshape(B * Np, din)
    npb = Np // block_points

    grid = (B, npb)
    out = pl.pallas_call(
        functools.partial(_kernel, num_layers=L, hidden=H,
                          matmul_dtype=matmul_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_points, din),
                         lambda b, i: (b * npb + i, 0),
                         memory_space=pltpu.VMEM),
            # small conditioning/weight tensors: whole-array resident in VMEM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # freq (B, L*H)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # phase
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b0
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ws
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf
        ],
        out_specs=pl.BlockSpec(
            (block_points, _OUT_PAD),
            lambda b, i: (b * npb + i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B * Np, _OUT_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * H * (din + (L - 1) * H + _OUT_PAD),
            bytes_accessed=B * Np * (din + _OUT_PAD) * 4,
            transcendentals=B * Np * H * L,
        ),
    )(pts2, freq, phase, w0, b0[None], ws, bs, wf_p, bf_p)

    out = out.reshape(B, Np, _OUT_PAD)[:, :N, :C]
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def film_siren_mlp(points, freq, phase, w0, b0, ws, bs, wf, bf):
    """Fused FiLM-SIREN evaluation; falls back to XLA off-TPU."""
    if jax.default_backend() != "tpu":
        return film_siren_mlp_reference(points, freq, phase, w0, b0, ws, bs, wf, bf)
    return _forward_pallas(points, freq, phase, w0, b0, ws, bs, wf, bf)


def _fwd(points, freq, phase, w0, b0, ws, bs, wf, bf):
    out = film_siren_mlp(points, freq, phase, w0, b0, ws, bs, wf, bf)
    return out, (points, freq, phase, w0, b0, ws, bs, wf, bf)


def _bwd(residuals, g):
    # backward through the (rematerialized) reference implementation
    _, vjp = jax.vjp(film_siren_mlp_reference, *residuals)
    return vjp(g)


film_siren_mlp.defvjp(_fwd, _bwd)
