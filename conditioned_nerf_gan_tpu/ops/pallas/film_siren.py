"""Fused FiLM-SIREN MLP point-evaluation kernel (Pallas / Mosaic).

The hot loop of the whole framework (SURVEY §3.1): millions of ray sample
points per image through an L-layer FiLM-SIREN —
    h_0 = sin(freq_0 ⊙ (x W_0 + b_0) + phase_0)
    h_l = sin(freq_l ⊙ (h_{l-1} W_l + b_l) + phase_l)
    out = h_{L-1} W_f + b_f                                (rgb+sigma, 4 ch)
with per-batch-element freq/phase vectors (reference generators/siren.py:146-160
applied in the stacks at :1210-1224 etc.).

Design (v3) and measured history (v5e-1, 1.57M points × SHORTSIREN 4×256,
bf16 matmuls, protocol in scripts/bench_film_kernel.py, results mirrored in
BASELINE.md):

    XLA fused module stack (fast_sin)        10.3 ms   (the unfused floor:
        it round-trips every (1.57M,256) activation through HBM — ~6.4 GB
        at bf16 ≈ 7.8 ms at peak BW — so it is HBM-bound, not MXU-bound)
    r2 kernel (point-major, dual-tile)       12.8 ms
    v3 ablations: matmul-only 10.3 / sin-chain-only 12.0 of a 12.4 total
        → ~6 µs/grid-cell COMMON overhead: the (T,3) input and (T,8)
        output blocks are lane-narrow, so their HBM↔VMEM DMAs degrade to
        row-by-row scatters (12/32 bytes per row)
    v4 TRANSPOSED layout (this kernel)        9.0 ms   activations (H, T),
        points along lanes → every DMA dense ((3,T) in, (8,T) out)
    v4 + degree-7 sin polynomial              7.5 ms   (1.37× over XLA)
    dual-chain interleave on top              7.5 ms   (no MXU/VPU overlap
        from Mosaic, same conclusion as r2's point-major attempt)

The remaining gap to the serial in-VMEM floor (~5.5 ms: bf16 MXU 3.3 ms +
sin chain ~2 ms) is MXU-idle-during-sin; closing it still needs
compiler-level async-MXU scheduling.

Precision: the kernel only routes under the bf16 compute policy (gated in
models/siren.py), whose matmul noise floor is ~4e-3. The degree-7 odd
minimax sin (max err 2.6e-4 end-to-end fp32, _sin7 below) sits 15× under
that floor; fast_sin (3.4e-6) is used by the XLA paths where fp32 golden
parity matters.

Weights stay VMEM-resident ((H,H) per layer per batch element), each point
tile is loaded once, and only the 8-channel padded output is written back.

Gradients: `film_siren_mlp` carries a custom VJP. On TPU the backward is
the fused Pallas `_backward_kernel` — recompute + full VJP sweep in one
VMEM-resident pass per point tile, the EXACT derivative of the kernel's
sin7 forward (22.2 vs XLA-autodiff 38.2 ms on the 1.57M-pt fwd+bwd,
1.72×). Its gradient structure matches the production FiLM-layer stack:
freq/phase grads arrive as rows of the folded weight-grad matmuls (r2's
129 ms/split multiply-reduce fix), so enabling the kernel changes training
gradients only within the policy's bf16 noise. Off-TPU both directions
fall back to the fp32 reference.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fastmath import fast_sin

# output channels padded to one sublane tile for efficient stores
_OUT_PAD = 8
_TILE = 2048  # lanes per grid cell (v5e sweep: 512→10.0, 1024→9.4, 2048→9.0)

_TWO_PI = 2.0 * math.pi
_INV_TWO_PI = 1.0 / _TWO_PI

# odd degree-7 least-squares fit of sin on [-pi, pi] at chebyshev nodes;
# max abs error 2.6e-4 end-to-end in fp32 (scripts/bench_film_kernel.py
# derivation) — 15× below the bf16 matmul noise of the only policy the
# kernel serves, and ~30% cheaper than fast_sin's degree-11 chain on the
# VPU-bound sin path.
_S1 = 9.9926289884e-01
_S3 = -1.6565644419e-01
_S5 = 7.9559223702e-03
_S7 = -1.4495299408e-04


def _sin7(x):
    x = x - jnp.round(x * _INV_TWO_PI) * _TWO_PI
    x2 = x * x
    return x * (_S1 + x2 * (_S3 + x2 * (_S5 + x2 * _S7)))


def _cos7(x):
    """d/dx of _sin7 — the EXACT derivative of the kernel's forward (the
    range reduction is a constant shift a.e., so d/dx sin7(x) = p'(r))."""
    x = x - jnp.round(x * _INV_TWO_PI) * _TWO_PI
    x2 = x * x
    return _S1 + x2 * (3.0 * _S3 + x2 * (5.0 * _S5 + x2 * (7.0 * _S7)))


def film_siren_mlp_reference(points, freq, phase, w0, b0, ws, bs, wf, bf):
    """Pure-jnp fp32 reference (the unfused XLA path). Shapes:
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
    """Fold freq into per-batch-element weight copies.

    sin(f⊙(xW+b)+φ) = sin(x(W·diag(f)) + (f⊙b+φ)) — returns w0f (B, Din, H),
    wsf (B, L-1, H, H) in matmul_dtype and the fused biases c0 (B, H),
    cs (B, L-1, H) in fp32.
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


def _folded_forward_jnp(points, freq, phase, w0, b0, ws, bs, wf, bf,
                        sin_fn=fast_sin, matmul_dtype=jnp.bfloat16):
    """Folded XLA formulation (default bf16 + fast_sin — the production-
    policy math of the FiLM-layer stack).

    With sin_fn=_sin7 this is the exact math the Pallas kernels compute —
    the comparator the interpret-mode tests differentiate and the oracle
    `check_kernel_tpu_parity.py` compares the real Mosaic lowering against.
    (Off-TPU, `film_siren_mlp` falls back to the fp32 reference in both
    directions; this folded form exists for tests and measurement.)
    """
    L = 1 + ws.shape[0]
    w0f, c0, wsf, cs = _fold_film(freq, phase, w0, b0, ws, bs, matmul_dtype)
    h = jnp.einsum("bnd,bdh->bnh", points.astype(matmul_dtype), w0f,
                   preferred_element_type=jnp.float32)
    h = sin_fn(h + c0[:, None])
    for l in range(L - 1):
        h = jnp.einsum("bnh,bhk->bnk", h.astype(matmul_dtype), wsf[:, l],
                       preferred_element_type=jnp.float32)
        h = sin_fn(h + cs[:, l][:, None])
    return jnp.einsum("bnh,hc->bnc", h.astype(matmul_dtype),
                      wf.astype(matmul_dtype),
                      preferred_element_type=jnp.float32) + bf


def _kernel(pts_ref, w0ft_ref, c0_ref, wsft_ref, cs_ref, wft_ref, bf_ref,
            out_ref, *, num_layers: int, sin_fn, matmul_dtype):
    """Transposed layout: activations (H, T), points along LANES.

    Every HBM↔VMEM block is lane-dense — input (3, T), output (8, T) —
    where the point-major (T, 3)/(T, 8) blocks of the r2 kernel forced
    row-by-row scatter DMAs (~6 µs/cell, the dominant cost its ablations
    isolate).
    """
    dims = (((1,), (0,)), ((), ()))
    x = pts_ref[0].astype(matmul_dtype)  # (Din, T)
    h = jax.lax.dot_general(w0ft_ref[0], x, dims,
                            preferred_element_type=jnp.float32)  # (H, T)
    h = sin_fn(h + c0_ref[0, 0][:, None])
    for l in range(num_layers - 1):
        h = jax.lax.dot_general(wsft_ref[0, l], h.astype(matmul_dtype), dims,
                                preferred_element_type=jnp.float32)
        h = sin_fn(h + cs_ref[0, l][:, None])
    out_ref[0] = jax.lax.dot_general(
        wft_ref[...], h.astype(matmul_dtype), dims,
        preferred_element_type=jnp.float32) + bf_ref[0][:, None]


def _forward_pallas(points, freq, phase, w0, b0, ws, bs, wf, bf,
                    tile: int = _TILE, matmul_dtype=jnp.bfloat16,
                    interpret: bool = False, sin_fn=_sin7):
    B, N, din = points.shape
    L = 1 + ws.shape[0]
    H = w0.shape[1]
    C = wf.shape[1]

    w0f, c0, wsf, cs = _fold_film(freq, phase, w0, b0, ws, bs, matmul_dtype)

    n_pad = -N % tile
    pts = jnp.pad(points, ((0, 0), (0, n_pad), (0, 0))) if n_pad else points
    Np = N + n_pad
    pts_t = pts.transpose(0, 2, 1)  # (B, Din, Np): points along lanes
    wf_pt = jnp.pad(wf, ((0, 0), (0, _OUT_PAD - C))).astype(matmul_dtype).T
    bf_p = jnp.pad(bf, (0, _OUT_PAD - C))[None]
    npb = Np // tile

    out = pl.pallas_call(
        functools.partial(_kernel, num_layers=L, sin_fn=sin_fn,
                          matmul_dtype=matmul_dtype),
        interpret=interpret,
        grid=(B, npb),
        in_specs=[
            pl.BlockSpec((1, din, tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            # per-batch-element folded weights (pre-transposed): resident
            # per grid row
            pl.BlockSpec((1, H, din), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H, H), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf^T (OUT_PAD, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf (1, OUT_PAD)
        ],
        out_specs=pl.BlockSpec((1, _OUT_PAD, tile), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, _OUT_PAD, Np), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * H * (din + (L - 1) * H + _OUT_PAD),
            bytes_accessed=B * Np * (din + _OUT_PAD) * 4,
            transcendentals=B * Np * H * L,
        ),
    )(pts_t, jnp.swapaxes(w0f, 1, 2), c0[:, None],
      jnp.swapaxes(wsf, 2, 3), cs, wf_pt, bf_p)

    return out.transpose(0, 2, 1)[:, :N, :C]


def _backward_kernel(x_ref, gt_ref, w0f_ref, c0_ref, wsft_ref, cs_ref,
                     wft_ref, dx_ref, dw0_ref, dws_ref, dwf_ref,
                     *, num_layers: int, matmul_dtype):
    """Fused FiLM-SIREN VJP, transposed layout (points on lanes).

    One pass per (batch element, point tile): recompute the forward with
    all activations VMEM-resident (bf16 h_l and cos_l = sin7'(pre_l)),
    then sweep the backward — dX lane-dense out, folded-weight/bias grads
    accumulated in revisited fp32 VMEM blocks across the point-tile grid
    axis. XLA's autodiff of the same math round-trips every (N, H)
    activation through HBM at least three times (forward replay + tangent
    chain + dW operands); here nothing but x, g, dx and the weight grads
    ever touch HBM.

    The bias/c grads ride the weight-grad matmuls: x carries a ones row at
    index din (dW0 row din = dc0) and each h_l is augmented with 8 ones
    rows (dW rows H.. = dc_l, 8 redundant copies — a full sublane tile).
    """
    i = pl.program_id(1)
    dims_nt = (((1,), (0,)), ((), ()))  # (H, K) x (K, T) -> (H, T)
    dims_tt = (((1,), (1,)), ((), ()))  # contract the lane/point axis
    dims_00 = (((0,), (0,)), ((), ()))  # contract the first axis of both

    x = x_ref[0].astype(matmul_dtype)  # (DA, T), row din = ones
    g = gt_ref[0]                      # (8, T) fp32 cotangent
    gb = g.astype(matmul_dtype)

    # ---- forward recompute, everything resident ----------------------
    hs = []    # bf16 activations h_l (H, T)
    coss = []  # bf16 sin7'(pre_l) (H, T)
    pre = jax.lax.dot_general(w0f_ref[0], x, dims_nt,
                              preferred_element_type=jnp.float32)
    pre = pre + c0_ref[0, 0][:, None]
    hs.append(_sin7(pre).astype(matmul_dtype))
    coss.append(_cos7(pre).astype(matmul_dtype))
    for l in range(num_layers - 1):
        pre = jax.lax.dot_general(wsft_ref[0, l], hs[-1], dims_nt,
                                  preferred_element_type=jnp.float32)
        pre = pre + cs_ref[0, l][:, None]
        hs.append(_sin7(pre).astype(matmul_dtype))
        coss.append(_cos7(pre).astype(matmul_dtype))

    ones8 = jnp.ones((8, x.shape[1]), matmul_dtype)

    # ---- backward sweep ----------------------------------------------
    dwf_c = jax.lax.dot_general(
        jnp.concatenate([hs[-1], ones8], axis=0), gb, dims_tt,
        preferred_element_type=jnp.float32)  # (H+8, 8)
    dh = jax.lax.dot_general(wft_ref[...], gb, dims_00,
                             preferred_element_type=jnp.float32)  # (H, T)
    dws_c = [None] * (num_layers - 1)
    for l in range(num_layers - 2, -1, -1):
        dpre = (dh * coss[l + 1]).astype(matmul_dtype)
        dws_c[l] = jax.lax.dot_general(
            jnp.concatenate([hs[l], ones8], axis=0), dpre, dims_tt,
            preferred_element_type=jnp.float32)  # (H+8, H)
        dh = jax.lax.dot_general(wsft_ref[0, l], dpre, dims_00,
                                 preferred_element_type=jnp.float32)
    dpre0 = (dh * coss[0]).astype(matmul_dtype)
    dw0_c = jax.lax.dot_general(x, dpre0, dims_tt,
                                preferred_element_type=jnp.float32)  # (DA, H)
    dx_ref[0] = jax.lax.dot_general(w0f_ref[0], dpre0, dims_00,
                                    preferred_element_type=jnp.float32)

    # ---- grid-axis accumulation into the revisited weight-grad blocks
    @pl.when(i == 0)
    def _init():
        dw0_ref[0] = dw0_c
        for l in range(num_layers - 1):
            dws_ref[0, l] = dws_c[l]
        dwf_ref[0] = dwf_c

    @pl.when(i != 0)
    def _acc():
        dw0_ref[0] += dw0_c
        for l in range(num_layers - 1):
            dws_ref[0, l] += dws_c[l]
        dwf_ref[0] += dwf_c


def _backward_pallas(points, freq, phase, w0, b0, ws, bs, wf, bf, g,
                     tile: int | None = None, matmul_dtype=jnp.bfloat16,
                     interpret: bool = False):
    """Kernel-path VJP: returns grads for the nine film_siren_mlp inputs.

    The kernel produces folded-space grads (dW0f, dc0, dWsf, dcs, dwf, dbf,
    dX); the fold unwind back to (freq, phase, W, b) space is tiny XLA
    epilogue math on (B, L, H)-sized tensors.
    """
    B, N, din = points.shape
    L = 1 + ws.shape[0]
    H = w0.shape[1]
    C = wf.shape[1]
    DA = -(-(din + 1) // 8) * 8  # din rows + a ones row, padded to a sublane
    if tile is None:
        # the resident h_l/cos_l stacks cost 2·L·H·tile·2 bytes of VMEM;
        # scale the tile so they stay ~4 MB (v5e sweep at L=4, H=256:
        # 512→23.9, 2048→22.2 ms per 1.57M-pt fwd+bwd)
        tile = max(512, 2048 * 4 * 256 // (L * H))

    w0f, c0, wsf, cs = _fold_film(freq, phase, w0, b0, ws, bs, matmul_dtype)

    n_pad = -N % tile
    pts_t = points.transpose(0, 2, 1)  # (B, din, N)
    x_aug = jnp.concatenate(
        [pts_t, jnp.ones((B, 1, N), points.dtype),
         jnp.zeros((B, DA - din - 1, N), points.dtype)], axis=1)
    gt = jnp.pad(g.transpose(0, 2, 1), ((0, 0), (0, _OUT_PAD - C), (0, 0)))
    if n_pad:  # zero-padding also zeroes the ones row on padded lanes
        x_aug = jnp.pad(x_aug, ((0, 0), (0, 0), (0, n_pad)))
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, n_pad)))
    Np = N + n_pad
    npb = Np // tile

    w0f_aug = jnp.pad(jnp.swapaxes(w0f, 1, 2), ((0, 0), (0, 0), (0, DA - din)))
    wft = jnp.pad(wf, ((0, 0), (0, _OUT_PAD - C))).astype(matmul_dtype).T

    dx_aug, dw0_aug, dws_aug, dwf_aug = pl.pallas_call(
        functools.partial(_backward_kernel, num_layers=L,
                          matmul_dtype=matmul_dtype),
        interpret=interpret,
        grid=(B, npb),
        in_specs=[
            pl.BlockSpec((1, DA, tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _OUT_PAD, tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, DA), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H, H), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf^T (OUT_PAD, H)
        ],
        out_specs=[
            pl.BlockSpec((1, DA, tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, DA, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H + 8, H), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 8, _OUT_PAD), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, DA, Np), jnp.float32),
            jax.ShapeDtypeStruct((B, DA, H), jnp.float32),
            jax.ShapeDtypeStruct((B, L - 1, H + 8, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H + 8, _OUT_PAD), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * B * Np * H * (din + (L - 1) * H + _OUT_PAD),
            bytes_accessed=B * Np * (2 * DA + 2 * _OUT_PAD) * 4,
            transcendentals=2 * B * Np * H * L,
        ),
    )(x_aug, gt, w0f_aug, c0[:, None], jnp.swapaxes(wsf, 2, 3), cs, wft)

    dpoints = dx_aug[:, :din, :N].transpose(0, 2, 1)
    dw0f = dw0_aug[:, :din]      # (B, din, H)
    dc0 = dw0_aug[:, din]        # (B, H)
    dwsf = dws_aug[:, :, :H]     # (B, L-1, H, H)
    dcs = dws_aug[:, :, H]       # (B, L-1, H)
    dwf = dwf_aug[:, :H, :C].sum(0)
    dbf = dwf_aug[:, H, :C].sum(0)

    # fold unwind: Wlf = W_l diag(f_l), c_l = f_l ⊙ b_l + φ_l
    f = freq.reshape(B, L, H)
    dw0 = (dw0f * f[:, 0][:, None, :]).sum(0)
    dws_ = (dwsf * f[:, 1:][:, :, None, :]).sum(0)
    df0 = (dw0f * w0[None]).sum(1) + dc0 * b0[None]
    dfs = (dwsf * ws[None]).sum(2) + dcs * bs[None]
    dfreq = jnp.concatenate([df0[:, None], dfs], axis=1).reshape(B, L * H)
    dphase = jnp.concatenate([dc0[:, None], dcs], axis=1).reshape(B, L * H)
    db0 = (dc0 * f[:, 0]).sum(0)
    dbs = (dcs * f[:, 1:]).sum(0)
    return dpoints, dfreq, dphase, dw0, db0, dws_, dbs, dwf, dbf


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
    # On TPU: the fused Pallas backward (recompute + VJP in one VMEM-
    # resident pass — the exact derivative of the kernel's sin7 forward).
    # Elsewhere: autodiff of the fp32 reference (tests compare against
    # fp32 autodiff).
    if jax.default_backend() == "tpu":
        return _backward_pallas(*residuals, g)
    _, vjp = jax.vjp(film_siren_mlp_reference, *residuals)
    return vjp(g)


film_siren_mlp.defvjp(_fwd, _bwd)
