#!/usr/bin/env python
"""Decompose the G render backward: SIREN-eval grad vs full render grad.

Times (fori-loop-chained, forced) at stage-2 shapes:
  A. siren point-eval forward          (18.9M pts)
  B. grad of siren point-eval
  C. render forward (hierarchical, ray_chunks)
  D. grad of render
Locates whether the backward overhead is in the MLP VJP or in the render
pipeline (merge/integration/chunking) around it.
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, args, trials=3):
    """fn(*args, trial_key) — the varying key defeats the relay's
    identical-(executable, args) memoization (see CLAUDE.md)."""
    run = jax.jit(lambda *a: fn(*a))
    k = jax.random.PRNGKey(777)
    out = run(*args, jax.random.fold_in(k, 0))
    jax.block_until_ready(out)
    best = float("inf")
    for t in range(trials):
        kt = jax.random.fold_in(k, 1 + t)
        t0 = time.time()
        out = float(run(*args, kt))
        best = min(best, (time.time() - t0))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=12)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--split", type=int, default=2)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--fp32", action="store_true")
    args = ap.parse_args()

    from conditioned_nerf_gan_tpu.models import ImplicitGenerator3d, RenderConfig

    dt = None if args.fp32 else jnp.bfloat16
    gen = ImplicitGenerator3d(siren_type="SHORTSIREN", z_dim=512, hidden_dim=256,
                              compute_dtype=dt, use_fast_sin=True)
    cfg = RenderConfig(img_size=args.img, num_steps=args.steps, fov=49.13,
                       ray_start=0.25, ray_end=1.95, hierarchical_sample=True,
                       white_back=True, ray_chunks=args.chunks)
    Bs = args.B // args.split  # per-accumulation-split batch, as in training
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(Bs, 512)).astype(np.float32))
    cams = jnp.broadcast_to(jnp.eye(4), (Bs, 4, 4)).astype(jnp.float32)
    key = jax.random.PRNGKey(0)
    params = gen.init(key, z, cams, RenderConfig(img_size=16, num_steps=8,
                                                 ray_chunks=0))
    n_pts = Bs * args.img * args.img * args.steps * 2
    # A/B run on ONE ray-chunk's worth of points (the unchunked full-image
    # grad needs ~40 GB of activations — that's what the chunked remat is for)
    n_eval = n_pts // max(args.chunks, 1)
    pts = jnp.asarray(rng.uniform(-0.5, 0.5, (Bs, n_eval // Bs, 3)).astype(np.float32))

    def chain(f):
        """iterate f with data dependence inside one jit; the trial key
        varies per call so each dispatch is distinct"""
        def run(*a):
            *fixed, trial_key = a
            def body(i, acc):
                return acc + f(*fixed, jax.random.fold_in(trial_key, i)) + acc * 1e-20
            return jax.lax.fori_loop(0, args.iters, body, jnp.zeros(()))
        return run

    # A: siren eval forward
    def eval_fwd(params, pts, z, k):
        out = gen.apply(params, pts, z, method="eval_points")
        return jnp.sum(out * 1e-9)
    tA = timeit(chain(eval_fwd), (params, pts, z)) / args.iters

    # B: siren eval grad
    def eval_grad(params, pts, z, k):
        g = jax.grad(lambda p: jnp.mean(
            gen.apply(p, pts, z, method="eval_points") ** 2))(params)
        return sum(jnp.sum(l) * 1e-9 for l in jax.tree.leaves(g))
    tB = timeit(chain(eval_grad), (params, pts, z)) / args.iters

    # C: render forward
    def render_fwd(params, z, cams, k):
        px, d = gen.apply(params, z, cams, cfg, rng=k, nerf_noise=0.1,
                          deterministic=False)
        return jnp.sum(px * 1e-9)
    tC = timeit(chain(render_fwd), (params, z, cams)) / args.iters

    # D: render grad
    def render_grad(params, z, cams, k):
        def loss(p, zz):
            px, d = gen.apply(p, zz, cams, cfg, rng=k, nerf_noise=0.1,
                              deterministic=False)
            return jnp.mean(px ** 2)
        g = jax.grad(loss)(params, z)
        return sum(jnp.sum(l) * 1e-9 for l in jax.tree.leaves(g))
    tD = timeit(chain(render_grad), (params, z, cams)) / args.iters

    x = args.split  # report per full batch (split × per-split cost)
    ck = max(args.chunks, 1)
    print(f"per-split: {Bs} imgs, {n_pts/1e6:.1f}M pts (A/B on {n_eval/1e6:.2f}M "
          f"= 1 chunk); x{args.split} splits for the step:")
    print(f"A siren eval fwd : {tA*1e3:7.1f} ms/chunk  ({x*ck*tA*1e3:7.1f} ms/step)")
    print(f"B siren eval grad: {tB*1e3:7.1f} ms/chunk  ({x*ck*tB*1e3:7.1f} ms/step)")
    print(f"C render fwd     : {tC*1e3:7.1f} ms        ({x*tC*1e3:7.1f} ms/step)")
    print(f"D render grad    : {tD*1e3:7.1f} ms        ({x*tD*1e3:7.1f} ms/step)")


if __name__ == "__main__":
    main()
