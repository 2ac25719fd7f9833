#!/usr/bin/env python
"""FiLM-SIREN kernel study v3: localize the Mosaic kernel's gap to its bounds.

r2 measured (BASELINE.md "Kernel study"): XLA stack 12.1 ms, Pallas v2
(dual-tile) 13.9 ms, matmul-only 8.1 ms, sin-only 5.0 ms on the 1.57M-point
SHORTSIREN eval. But the 8.1 ms "matmul-only" comparator was the *unfused XLA*
matmul chain — which round-trips every (1.57M, 256) activation through HBM
(~6.4 GB at bf16 → ~7.8 ms at peak BW), so it is an HBM bound, not an MXU
bound. A VMEM-resident kernel's true serial floor is
    MXU (0.62 TFLOP @ ~90% of 197 TF/s)  ~3.5 ms
  + sin VPU chain                         ~5.0 ms
  ≈ 8.5 ms  — 1.4× below XLA's 12.1, 1.6× below the r2 kernel's 13.9.

This script measures in-kernel unit rates by ablation to find the missing
milliseconds:
    xla        unfused production analogue (folded FiLM, bf16 dots, fast_sin)
    v2         the shipped dual-tile kernel (reproduce 13.9)
    single     single-chain variant, tile sweep
    nosin      single-chain with the sin replaced by an affine (MXU rate)
    nodot      single-chain with trunk dots replaced by affine (VPU sin rate)
    jnpsin     single-chain with jnp.sin instead of fast_sin

Protocol (CLAUDE.md): iterations chained inside one lax.fori_loop with a
data-dependent accumulator, inputs as jit ARGUMENTS, min of >=3 trials with
distinct keys. Run: python scripts/bench_film_kernel.py [variants...]
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conditioned_nerf_gan_tpu.ops.fastmath import fast_sin
from conditioned_nerf_gan_tpu.ops.pallas.film_siren import (
    _fold_film,
    _forward_pallas,
    _sin7 as sin7,  # the shipped polynomial — the A/B must benchmark it
    film_siren_mlp_reference,
)

B, N, DIN, H, L, C = 2, 786432, 3, 256, 4, 4
ITERS = 20
_OUT_PAD = 8


def make_inputs(seed: int):
    rng = np.random.default_rng(seed)
    return dict(
        points=rng.uniform(-0.3, 0.3, (B, N, DIN)).astype(np.float32),
        freq=rng.uniform(25, 45, (B, L * H)).astype(np.float32),
        phase=rng.uniform(-1, 1, (B, L * H)).astype(np.float32),
        w0=rng.normal(0, 0.5, (DIN, H)).astype(np.float32),
        b0=rng.normal(0, 0.1, (H,)).astype(np.float32),
        ws=rng.normal(0, 0.1, (L - 1, H, H)).astype(np.float32),
        bs=rng.normal(0, 0.1, (L - 1, H)).astype(np.float32),
        wf=rng.normal(0, 0.1, (H, C)).astype(np.float32),
        bf=rng.normal(0, 0.1, (C,)).astype(np.float32),
    )


# ----------------------------------------------------------------------
# variant kernels (single chain, ablation switches)
# ----------------------------------------------------------------------

def _kernel_v3(points_ref, w0f_ref, c0_ref, wsf_ref, cs_ref, wf_ref, bf_ref,
               out_ref, *, num_layers, mode):
    x = points_ref[...].astype(jnp.bfloat16)
    c0 = c0_ref[0, 0]
    h = jnp.dot(x, w0f_ref[0], preferred_element_type=jnp.float32) + c0
    h = fast_sin(h) if mode != "jnpsin" else jnp.sin(h)
    for l in range(num_layers - 1):
        c = cs_ref[0, l]
        if mode == "nodot":
            h2 = h + c  # keep the VPU sin chain, drop the MXU work
        else:
            h2 = jnp.dot(h.astype(jnp.bfloat16), wsf_ref[0, l],
                         preferred_element_type=jnp.float32) + c
        if mode == "nosin":
            h = h2 * 0.9  # keep a cheap epilogue, drop the sin chain
        elif mode == "jnpsin":
            h = jnp.sin(h2)
        else:
            h = fast_sin(h2)
    out_ref[...] = jnp.dot(h.astype(jnp.bfloat16), wf_ref[...],
                           preferred_element_type=jnp.float32) + bf_ref[0]


def forward_v3(points, freq, phase, w0, b0, ws, bs, wf, bf,
               tile=1024, mode="single"):
    Bb, Nn, din = points.shape
    w0f, c0, wsf, cs = _fold_film(freq, phase, w0, b0, ws, bs, jnp.bfloat16)
    wf_p = jnp.pad(wf, ((0, 0), (0, _OUT_PAD - C))).astype(jnp.bfloat16)
    bf_p = jnp.pad(bf, (0, _OUT_PAD - C))[None]
    pts2 = points.reshape(Bb * Nn, din)
    npb = Nn // tile
    out = pl.pallas_call(
        functools.partial(_kernel_v3, num_layers=L, mode=mode),
        grid=(Bb, npb),
        in_specs=[
            pl.BlockSpec((tile, din), lambda b, i: (b * npb + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, din, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H, H), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, _OUT_PAD), lambda b, i: (b * npb + i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bb * Nn, _OUT_PAD), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bb * Nn * H * (din + (L - 1) * H + _OUT_PAD),
            bytes_accessed=Bb * Nn * (din + _OUT_PAD) * 4,
            transcendentals=Bb * Nn * H * L,
        ),
    )(pts2, w0f, c0[:, None], wsf, cs, wf_p, bf_p)
    return out.reshape(Bb, Nn, _OUT_PAD)[..., :C]


def _kernel_v4(pts_ref, w0ft_ref, c0_ref, wsft_ref, cs_ref, wft_ref, bf_ref,
               out_ref, *, num_layers, mode="full"):
    """Transposed layout: activations (H, T), points along LANES.

    Every HBM<->VMEM block is lane-dense — input (3, T), output (8, T) —
    instead of the v2/v3 (T, 3)/(T, 8) blocks whose 12/32-byte rows force
    row-by-row scatter DMAs (the ~6 us/cell overhead the ablations isolate).
    """
    sin_fn = {"full": fast_sin, "sin7": sin7,
              "nosin": lambda v: v * 0.9, "nodot": fast_sin}[mode]
    x = pts_ref[0].astype(jnp.bfloat16)  # (3, T)
    h = jax.lax.dot_general(
        w0ft_ref[0], x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (H,3)x(3,T) -> (H, T)
    h = sin_fn(h + c0_ref[0, 0][:, None])
    for l in range(num_layers - 1):
        if mode == "nodot":
            h2 = h + cs_ref[0, l][:, None]
        else:
            h2 = jax.lax.dot_general(
                wsft_ref[0, l], h.astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + cs_ref[0, l][:, None]
        h = sin_fn(h2)
    out_ref[0] = jax.lax.dot_general(
        wft_ref[...], h.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bf_ref[0][:, None]


def _kernel_v5(pts_ref, w0ft_ref, c0_ref, wsft_ref, cs_ref, wft_ref, bf_ref,
               out_ref, *, num_layers, half):
    """v4 + two textually interleaved half-tile chains (overlap probe)."""
    x = pts_ref[0].astype(jnp.bfloat16)  # (3, 2*half)
    w0t = w0ft_ref[0]
    c0 = c0_ref[0, 0][:, None]
    dims = (((1,), (0,)), ((), ()))
    ha = jax.lax.dot_general(w0t, x[:, :half], dims,
                             preferred_element_type=jnp.float32)
    hb = jax.lax.dot_general(w0t, x[:, half:], dims,
                             preferred_element_type=jnp.float32)
    ha = sin7(ha + c0)
    hb = sin7(hb + c0)
    for l in range(num_layers - 1):
        w = wsft_ref[0, l]
        c = cs_ref[0, l][:, None]
        ha2 = jax.lax.dot_general(w, ha.astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        hb2 = jax.lax.dot_general(w, hb.astype(jnp.bfloat16), dims,
                                  preferred_element_type=jnp.float32)
        ha = sin7(ha2 + c)
        hb = sin7(hb2 + c)
    wft = wft_ref[...]
    bfc = bf_ref[0][:, None]
    out_ref[0, :, :half] = jax.lax.dot_general(
        wft, ha.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32) + bfc
    out_ref[0, :, half:] = jax.lax.dot_general(
        wft, hb.astype(jnp.bfloat16), dims,
        preferred_element_type=jnp.float32) + bfc


def forward_v4(points, freq, phase, w0, b0, ws, bs, wf, bf, tile=1024,
               mode="full"):
    Bb, Nn, din = points.shape
    w0f, c0, wsf, cs = _fold_film(freq, phase, w0, b0, ws, bs, jnp.bfloat16)
    wf_p = jnp.pad(wf, ((0, 0), (0, _OUT_PAD - C))).astype(jnp.bfloat16)
    pts_t = points.transpose(0, 2, 1)  # (B, 3, N)
    npb = Nn // tile
    if mode == "interleave":
        kern = functools.partial(_kernel_v5, num_layers=L, half=tile // 2)
    else:
        kern = functools.partial(_kernel_v4, num_layers=L, mode=mode)
    out = pl.pallas_call(
        kern,
        grid=(Bb, npb),
        in_specs=[
            pl.BlockSpec((1, din, tile), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, din), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # w0^T (B,H,3)
            pl.BlockSpec((1, 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L - 1, H, H), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # W^T copies
            pl.BlockSpec((1, L - 1, H), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wf^T (8, H)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bf (1, 8)
        ],
        out_specs=pl.BlockSpec((1, _OUT_PAD, tile), lambda b, i: (b, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bb, _OUT_PAD, Nn), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bb * Nn * H * (din + (L - 1) * H + _OUT_PAD),
            bytes_accessed=Bb * Nn * (din + _OUT_PAD) * 4,
            transcendentals=Bb * Nn * H * L,
        ),
    )(pts_t, jnp.swapaxes(w0f, 1, 2), c0[:, None],
      jnp.swapaxes(wsf, 2, 3), cs, wf_p.T,
      jnp.pad(bf, (0, _OUT_PAD - C))[None])
    return out.transpose(0, 2, 1)[..., :C]


def xla_prod(points, freq, phase, w0, b0, ws, bs, wf, bf):
    """Production-analogue XLA path: folded FiLM, bf16 dots, fast_sin."""
    w0f, c0, wsf, cs = _fold_film(freq, phase, w0, b0, ws, bs, jnp.bfloat16)
    h = jnp.einsum("bnd,bdh->bnh", points.astype(jnp.bfloat16), w0f,
                   preferred_element_type=jnp.float32)
    h = fast_sin(h + c0[:, None])
    for l in range(L - 1):
        h = jnp.einsum("bnh,bhk->bnk", h.astype(jnp.bfloat16), wsf[:, l],
                       preferred_element_type=jnp.float32)
        h = fast_sin(h + cs[:, l][:, None])
    return jnp.einsum("bnh,hc->bnc", h.astype(jnp.bfloat16),
                      wf.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32) + bf


def bench(fn_name: str, fn, seeds=(0, 1, 2)) -> float:
    """min-of-trials time per eval, fori-loop chained (tunnel-safe)."""

    def loop(inp):
        def body(_, carry):
            pts, acc = carry
            out = fn(pts, inp["freq"], inp["phase"], inp["w0"], inp["b0"],
                     inp["ws"], inp["bs"], inp["wf"], inp["bf"])
            # data dependence: perturb the points with the output's rgb
            pts = pts + 1e-6 * out[..., :3]
            return pts, acc + out[0, 0, 0]

        (_, acc) = jax.lax.fori_loop(
            0, ITERS, body, (inp["points"], jnp.float32(0.0)))[0:2]
        return acc

    jl = jax.jit(loop)
    best = float("inf")
    for s in seeds:
        inp = {k: jnp.asarray(v) for k, v in make_inputs(s).items()}
        jl(inp).block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        float(jl(inp))
        dt = (time.perf_counter() - t0) / ITERS
        best = min(best, dt)
    pts = B * N
    print(f"{fn_name:>18}: {best*1e3:7.2f} ms  "
          f"({pts/best/1e6:6.1f} Mpts/s)", flush=True)
    return best


def bench_vjp(fn_name: str, fn, seeds=(0, 1, 2)) -> float:
    """fwd+bwd time per eval: jax.vjp over all nine inputs, fori-chained."""

    def loop(inp):
        rest = (inp["freq"], inp["phase"], inp["w0"], inp["b0"],
                inp["ws"], inp["bs"], inp["wf"], inp["bf"])

        def body(_, carry):
            pts, acc = carry
            out, vjp = jax.vjp(fn, pts, *rest)
            grads = vjp(jnp.ones_like(out) + 1e-6 * out)
            pts = pts + 1e-6 * grads[0]
            return pts, acc + grads[3][0, 0]

        (_, acc) = jax.lax.fori_loop(
            0, ITERS, body, (inp["points"], jnp.float32(0.0)))
        return acc

    jl = jax.jit(loop)
    best = float("inf")
    for s in seeds:
        inp = {k: jnp.asarray(v) for k, v in make_inputs(s).items()}
        jl(inp).block_until_ready()
        t0 = time.perf_counter()
        float(jl(inp))
        dt = (time.perf_counter() - t0) / ITERS
        best = min(best, dt)
    pts = B * N
    print(f"{fn_name:>18}: {best*1e3:7.2f} ms  "
          f"({pts/best/1e6:6.1f} Mpts/s fwd+bwd)", flush=True)
    return best


VARIANTS = {
    "xla": lambda: ("xla_prod", xla_prod),
    "xla_unfolded": lambda: ("xla_unfolded", film_siren_mlp_reference),
    "v2": lambda: ("pallas_v2_dual", lambda *a: _forward_pallas(*a)),
    "single": lambda: ("v3_single_1024",
                       functools.partial(forward_v3, tile=1024)),
    "single2048": lambda: ("v3_single_2048",
                           functools.partial(forward_v3, tile=2048)),
    "single4096": lambda: ("v3_single_4096",
                           functools.partial(forward_v3, tile=4096)),
    "single512": lambda: ("v3_single_512",
                          functools.partial(forward_v3, tile=512)),
    "nosin": lambda: ("v3_nosin_1024",
                      functools.partial(forward_v3, tile=1024, mode="nosin")),
    "nodot": lambda: ("v3_nodot_1024",
                      functools.partial(forward_v3, tile=1024, mode="nodot")),
    "jnpsin": lambda: ("v3_jnpsin_1024",
                       functools.partial(forward_v3, tile=1024, mode="jnpsin")),
    "v4": lambda: ("v4_transposed_1024",
                   functools.partial(forward_v4, tile=1024)),
    "v4_512": lambda: ("v4_transposed_512",
                       functools.partial(forward_v4, tile=512)),
    "v4_2048": lambda: ("v4_transposed_2048",
                        functools.partial(forward_v4, tile=2048)),
    "v4_nosin": lambda: ("v4_nosin_2048",
                         functools.partial(forward_v4, tile=2048, mode="nosin")),
    "v4_nodot": lambda: ("v4_nodot_2048",
                         functools.partial(forward_v4, tile=2048, mode="nodot")),
    "v4_sin7": lambda: ("v4_sin7_2048",
                        functools.partial(forward_v4, tile=2048, mode="sin7")),
    "v4_4096": lambda: ("v4_transposed_4096",
                        functools.partial(forward_v4, tile=4096)),
    "v5": lambda: ("v5_interleave_2048",
                   functools.partial(forward_v4, tile=2048,
                                     mode="interleave")),
    "v5_sin7_1024": lambda: ("v5_interleave_1024",
                             functools.partial(forward_v4, tile=1024,
                                               mode="interleave")),
}


VJP_VARIANTS = {
    "vjp_xla": lambda: ("vjp_xla_prod", xla_prod),
    "vjp_kernel": lambda: ("vjp_pallas_fused", None),  # resolved below
    "vjp_kernel_512": lambda: ("vjp_pallas_512", 512),
    "vjp_kernel_2048": lambda: ("vjp_pallas_2048", 2048),
}


def _kernel_vjp_fn(tile=None):
    """film_siren_mlp with the fused Pallas fwd+bwd (optionally a given
    backward tile) — rebuilt as a local custom_vjp so tile sweeps don't
    mutate the library function."""
    from conditioned_nerf_gan_tpu.ops.pallas import film_siren as fs

    if tile is None:
        return fs.film_siren_mlp

    @jax.custom_vjp
    def f(*args):
        return fs._forward_pallas(*args)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        return fs._backward_pallas(*res, g, tile=tile)

    f.defvjp(fwd, bwd)
    return f


if __name__ == "__main__":
    names = sys.argv[1:] or ["xla", "v2", "single", "nosin", "nodot"]
    print(f"device: {jax.devices()[0].device_kind}; {B}x{N} points, "
          f"{L}x{H} SHORTSIREN, {ITERS} chained iters/trial")
    for n in names:
        if n in VJP_VARIANTS:
            label, spec = VJP_VARIANTS[n]()
            fn = _kernel_vjp_fn(spec) if n != "vjp_xla" else spec
            bench_vjp(label, fn)
        else:
            label, fn = VARIANTS[n]()
            bench(label, fn)
