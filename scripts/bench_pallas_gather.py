#!/usr/bin/env python
"""Mosaic gather-floor study (r3, verdict item 5).

Question: can a Pallas kernel beat the XLA gather engine's measured
~40 ns/point floor (BASELINE.md r2: 62 ms / 1.57M points from a 64³×32ch
volume) by holding the volume in VMEM and doing per-point dynamic-slice
loads, instead of HBM gather segments?

This benchmarks the KERNEL CORE only, under the most favorable possible
conditions: the (expanded-channel) slab is VMEM-resident, every point's row
offset is precomputed, and points are pre-binned so no binning cost is paid
— i.e. an upper bound on what a full binned-trilerp kernel could achieve.
If even this core can't beat 40 ns/point, the floor is hardware, not XLA.

Layout: slab (H*W, 4C) bf16 rows (zy-neighbors expanded into channels, as
ops/grid_sample.py's _gather_blocks); per point: one dynamic (2, 4C) row
pair load + trilinear combine on the VPU.
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(blk: int, c: int, unroll: int):
    # Mosaic constraint: dynamic sublane starts must be 8-aligned, so the
    # kernel loads the aligned 16-row window containing the (off, off+1)
    # pair and folds the x-lerp into a weighted one-hot sublane reduction:
    #   x0 = sum_r [wx0·(r == d) + wx1·(r == d+1)] · window[r]   (d = off−base)

    def kernel(off_ref, w_ref, slab_ref, out_ref):
        # off_ref: (blk, 1) int32 row offsets into slab (anchor row)
        # w_ref:   (blk, 8) f32  [wx0,wx1, u00,u01,u10,u11, _, _]
        # slab_ref:(ROWS, 4C) f32 VMEM-resident expanded slab (8-row tiles)
        # out_ref: (blk, C) f32
        iota16 = jax.lax.broadcasted_iota(jnp.int32, (16, 1), 0)

        def body(i, _):
            def one(j, __):
                p = i * unroll + j
                off = off_ref[p, 0]
                base = (off // 8) * 8
                window = slab_ref[pl.ds(base, 16), :]  # (16, 4C)
                d = off - base
                w = w_ref[p, :]
                mask = (
                    jnp.where(iota16 == d, w[0], 0.0)
                    + jnp.where(iota16 == d + 1, w[1], 0.0)
                )  # (16, 1)
                x0 = jnp.sum(window * mask, axis=0, keepdims=True)  # (1, 4C)
                acc = (
                    x0[:, 0 * c : 1 * c] * w[2]
                    + x0[:, 1 * c : 2 * c] * w[3]
                    + x0[:, 2 * c : 3 * c] * w[4]
                    + x0[:, 3 * c : 4 * c] * w[5]
                )
                out_ref[p, :] = acc[0]
                return __

            return jax.lax.fori_loop(0, unroll, one, _, unroll=True)

        jax.lax.fori_loop(0, blk // unroll, body, 0)

    return kernel


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_572_864)
    ap.add_argument("--c", type=int, default=32)
    ap.add_argument("--rows", type=int, default=4096)  # H*W of one z-slab
    ap.add_argument("--blk", type=int, default=8192)
    ap.add_argument("--unroll", type=int, default=8)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    c, blk = args.c, args.blk
    n = args.n - args.n % blk
    rng = np.random.default_rng(0)
    slab = jnp.asarray(
        rng.normal(size=(args.rows, 4 * c)).astype(np.float32)
    )
    offs = jnp.asarray(
        rng.integers(0, args.rows - 17, size=(n, 1)).astype(np.int32)
    )
    w = jnp.asarray(rng.uniform(0.1, 0.9, size=(n, 8)).astype(np.float32))

    kernel = make_kernel(blk, c, args.unroll)

    def build(n_pts):
        return pl.pallas_call(
            kernel,
            grid=(n_pts // blk,),
            in_specs=[
                pl.BlockSpec((blk, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((blk, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((args.rows, 4 * c), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((blk, c), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_pts, c), jnp.float32),
            interpret=args.interpret,
        )

    fn = build(n)

    # correctness vs the jnp formulation
    def ref(offs, w, slab):
        rows = slab.astype(jnp.float32)
        r0 = rows[offs[:, 0]]
        r1 = rows[offs[:, 0] + 1]
        x0 = r0 * w[:, 0:1] + r1 * w[:, 1:2]
        return (
            x0[:, 0 * c : 1 * c] * w[:, 2:3]
            + x0[:, 1 * c : 2 * c] * w[:, 3:4]
            + x0[:, 2 * c : 3 * c] * w[:, 4:5]
            + x0[:, 3 * c : 4 * c] * w[:, 5:6]
        )

    small = 4 * blk
    got = np.asarray(build(small)(offs[:small], w[:small], slab))
    want = np.asarray(jax.jit(ref)(offs[:small], w[:small], slab))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)
    print("kernel correct on", small, "points")
    if args.interpret:
        return

    # fori-chained timing (CLAUDE.md: per-dispatch host timing lies)
    def chained(offs, w, slab, key):
        def body(i, acc):
            o = (offs + i) % (args.rows - 17)
            out = fn(o, w, slab)
            return acc + out[0, 0] * 1e-9 + acc * 1e-20

        return jax.lax.fori_loop(0, args.iters, body, jnp.zeros(()))

    run = jax.jit(chained)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    float(run(offs, w, slab, key))
    print(f"compile+first: {time.time()-t0:.1f}s", flush=True)
    best = float("inf")
    for t in range(3):
        kt = jax.random.fold_in(key, t)
        t0 = time.time()
        float(run(offs, w, slab, kt))
        best = min(best, (time.time() - t0) / args.iters)
    ns_per_pt = best / n * 1e9
    print(f"BEST: {best*1e3:.1f} ms for {n/1e6:.2f}M pts = "
          f"{ns_per_pt:.1f} ns/point (XLA gather floor: ~40 ns/point)")


if __name__ == "__main__":
    main()
