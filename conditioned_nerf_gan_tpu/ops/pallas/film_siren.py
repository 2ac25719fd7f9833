"""Fused FiLM-SIREN MLP point-evaluation kernel (Pallas / Mosaic).

The hot loop of the whole framework (SURVEY §3.1): millions of ray sample
points per image through an L-layer FiLM-SIREN —
    h_0 = sin(freq_0 ⊙ (x W_0 + b_0) + phase_0)
    h_l = sin(freq_l ⊙ (h_{l-1} W_l + b_l) + phase_l)
    out = h_{L-1} W_f + b_f                                (rgb+sigma, 4 ch)
with per-batch-element freq/phase vectors (reference generators/siren.py:146-160
applied in the stacks at :1210-1224 etc.).

Design (v2) and measured verdict (v5e-1, 1.57M points × SHORTSIREN 4×256,
bf16 matmuls + fast_sin, /tmp-protocol mirrored in BASELINE.md):

    XLA fused module stack   12.1 ms   (52 TF/s, 26% peak)
    this kernel (v2)         13.9 ms   (45 TF/s)
    matmul-only bound         8.1 ms   (77 TF/s)
    sin+affine-only bound     5.0 ms

The eval is jointly MXU/VPU-bound: the full pipeline costs ≈ matmul + sin
with near-zero overlap under BOTH compilers. v2 attacks that two ways —
(1) **FiLM folding**: sin(f⊙(xW+b)+φ) = sin(x(W·diag(f)) + (f⊙b+φ)), folding
freq into per-batch-element bf16 weight copies (removes a VPU mul+add per
activation); (2) **dual-tile interleave**: each grid cell runs two
independent point tiles with textually interleaved layer chains hoping
Mosaic schedules tile B's matmul under tile A's sin. Measured: neither moves
the needle (the fold is <1% on the XLA path too; Mosaic does not in fact
overlap the interleaved chains), so the XLA path — which already fuses the
affine+sin epilogue into one VPU pass — stays the default and `use_pallas`
is an off-by-default flag. A future Mosaic with async matmul primitives (or
explicit MXU queue control) could close the ~1.5× gap to the matmul bound;
until then this kernel documents the attempt and the bound.

Weights stay VMEM-resident ((H,H) per layer per batch element), each point
tile is loaded once, and only the 8-channel padded output is written back.

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


def _fold_film(freq, phase, w0, b0, ws, bs, matmul_dtype):
    """Fold freq into per-batch-element weight copies (move 1 above).

    Returns w0f (B, Din, H), wsf (B, L-1, H, H) in matmul_dtype and the
    fused biases c0 (B, H), cs (B, L-1, H) in fp32.
    """
    H = w0.shape[1]
    L = 1 + ws.shape[0]
    f = freq.reshape(freq.shape[0], L, H)
    p = phase.reshape(phase.shape[0], L, H)
    w0f = (w0[None] * f[:, 0][:, None, :]).astype(matmul_dtype)
    c0 = f[:, 0] * b0 + p[:, 0]
    wsf = (ws[None] * f[:, 1:][:, :, None, :]).astype(matmul_dtype)
    cs = f[:, 1:] * bs[None] + p[:, 1:]
    return w0f, c0, wsf, cs


def _kernel(points_ref, w0f_ref, c0_ref, wsf_ref, cs_ref, wf_ref, bf_ref,
            out_ref, *, num_layers: int, tile: int, matmul_dtype):
    x = points_ref[...].astype(matmul_dtype)  # (2*tile, Din)
    w0 = w0f_ref[0]
    c0 = c0_ref[0, 0]
    wf = wf_ref[...]
    bf = bf_ref[0]

    # two independent chains, textually interleaved: the MXU runs tile b's
    # matmul while the VPU evaluates tile a's sin
    ha = jnp.dot(x[:tile], w0, preferred_element_type=jnp.float32)
    hb = jnp.dot(x[tile:], w0, preferred_element_type=jnp.float32)
    ha = fast_sin(ha + c0)
    hb = fast_sin(hb + c0)
    for l in range(num_layers - 1):
        w = wsf_ref[0, l]
        c = cs_ref[0, l]
        ha2 = jnp.dot(ha.astype(matmul_dtype), w,
                      preferred_element_type=jnp.float32)
        hb2 = jnp.dot(hb.astype(matmul_dtype), w,
                      preferred_element_type=jnp.float32)
        ha = fast_sin(ha2 + c)
        hb = fast_sin(hb2 + c)
    oa = jnp.dot(ha.astype(matmul_dtype), wf,
                 preferred_element_type=jnp.float32)
    ob = jnp.dot(hb.astype(matmul_dtype), wf,
                 preferred_element_type=jnp.float32)
    out_ref[:tile] = oa + bf
    out_ref[tile:] = ob + bf


def _forward_pallas(points, freq, phase, w0, b0, ws, bs, wf, bf,
                    tile: int = 1024, matmul_dtype=jnp.bfloat16,
                    interpret: bool = False):
    B, N, din = points.shape
    L = 1 + ws.shape[0]
    H = w0.shape[1]
    C = wf.shape[1]
    block_points = 2 * tile

    w0f, c0, wsf, cs = _fold_film(freq, phase, w0, b0, ws, bs, matmul_dtype)

    # pad N to a block multiple; pad the final projection to a full sublane
    n_pad = -N % block_points
    pts = jnp.pad(points, ((0, 0), (0, n_pad), (0, 0))) if n_pad else points
    Np = N + n_pad
    wf_p = jnp.pad(wf, ((0, 0), (0, _OUT_PAD - C))).astype(matmul_dtype)
    bf_p = jnp.pad(bf, (0, _OUT_PAD - C))[None]

    pts2 = pts.reshape(B * Np, din)
    npb = Np // block_points

    grid = (B, npb)
    out = pl.pallas_call(
        functools.partial(_kernel, num_layers=L, tile=tile,
                          matmul_dtype=matmul_dtype),
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_points, din),
                         lambda b, i: (b * npb + i, 0),
                         memory_space=pltpu.VMEM),
            # per-batch-element folded weights: resident per grid row
            pl.BlockSpec((1, din, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, H) so the trailing block tile (1, H) matches the
            # array dims (TPU lowering constraint on the last two dims)
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H, H), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
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
    )(pts2, w0f, c0[:, None], wsf, cs, wf_p, bf_p)

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
