#!/usr/bin/env python
"""Measure train-step wall time on the real TPU chip.

Methodology (see CLAUDE.md): N steps chained inside ONE jitted lax.fori_loop
with the evolving TrainState as the data dependence, forced with a scalar
download; min of >=3 trials. All big arrays are passed as jit ARGUMENTS (the
remote compile helper rejects large closure constants).

Usage: python scripts/bench_train_step.py [--stage N] [--steps N] [--fp32]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2, help="thousand curriculum stage (0-3)")
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--fp32", action="store_true", help="disable the bf16 compute policy")
    ap.add_argument("--no_disc", action="store_true", help="ablation: drop the discriminator (D step + G adv term)")
    ap.add_argument("--no_hier", action="store_true", help="ablation: coarse-only sampling")
    ap.add_argument("--no_photo", action="store_true", help="ablation: drop the photometric loss")
    ap.add_argument("--pcl_points", type=int, default=65536, help="full pcl size before num_points_ratio")
    ap.add_argument("--split", type=int, default=None, help="override batch_split")
    ap.add_argument("--chunks", type=int, default=None, help="override ray_chunks")
    ap.add_argument("--config", type=str, default=None,
                    help="thousand experiment overlay (e.g. dg_shortsiren_dis for the voxel/U-Net family)")
    ap.add_argument("--batch", type=int, default=None, help="override batch_size")
    ap.add_argument("--pallas", action="store_true",
                    help="force the fused SIREN kernel on (preset default: on)")
    ap.add_argument("--no_pallas", action="store_true",
                    help="force the fused SIREN kernel off (XLA A/B baseline)")
    ap.add_argument("--save_outputs", action="store_true",
                    help="ablation: save the SIREN eval outputs across the "
                         "ray-chunk remat instead of replaying the evals")
    args = ap.parse_args()

    from conditioned_nerf_gan_tpu.training import create_train_state, make_train_step
    from conditioned_nerf_gan_tpu.utils import setup_compile_cache
    from conditioned_nerf_gan_tpu.utils.bench_setup import build_stage_bench

    # remote compiles cost ~5 min per program; compile time is outside the
    # measurement (the warmup call absorbs it), so repeat A/B runs should
    # hit the same persistent cache the CLIs/tests use
    setup_compile_cache()

    meta_overrides = {}
    if args.fp32:
        meta_overrides["compute_dtype"] = None
    if args.no_disc:
        meta_overrides["enable_discriminator"] = False
    if args.no_hier:
        meta_overrides["hierarchical_sample"] = False
    if args.no_photo:
        meta_overrides["photo_loss"] = False
    if args.split is not None:
        meta_overrides["batch_split"] = args.split
    if args.chunks is not None:
        meta_overrides["ray_chunks"] = args.chunks
    if args.batch is not None:
        meta_overrides["batch_size"] = args.batch
    force_pallas = None
    if args.pallas:
        force_pallas = True
    if args.no_pallas:
        force_pallas = False

    gen, enc, disc, cfg, batch, meta = build_stage_bench(
        stage=args.stage, config=args.config, pcl_points=args.pcl_points,
        meta_overrides=meta_overrides, force_pallas=force_pallas,
        save_siren_outputs=args.save_outputs,
    )
    dtype_name = meta.get("compute_dtype")
    B = meta["batch_size"]
    img = meta["img_size"]
    cond_desc = (f"voxel {meta.get('voxel_resolution', 64)}^3"
                 if "voxel" in batch else f"pcl {batch['pcl'].shape[1]}")
    print(f"stage {args.stage}: img {img}, batch {B} (split {cfg.batch_split}, "
          f"ray_chunks {cfg.render.ray_chunks}), num_steps {cfg.render.num_steps}, "
          f"{cond_desc}, dtype {dtype_name or 'float32'}")

    key = jax.random.PRNGKey(0)
    state = jax.jit(lambda k, b: create_train_state(k, gen, enc, disc, b, cfg))(
        key, batch
    )
    jax.block_until_ready(state.params_G)
    train_step = make_train_step(gen, enc, disc, cfg)

    def run_n(state, batch, key):
        def body(i, carry):
            st, acc = carry
            st, metrics = train_step(
                st, batch, jax.random.fold_in(key, i),
                jnp.float32(0.5), jnp.float32(0.1),
            )
            return st, acc + metrics["photo_loss"]
        st, acc = jax.lax.fori_loop(0, args.steps, body, (state, jnp.zeros(())))
        return acc, st.step

    run = jax.jit(run_n)
    print("compiling...", flush=True)
    t0 = time.time()
    acc, _ = run(state, batch, key)
    print(f"compile+first: {time.time()-t0:.1f}s acc={float(acc):.4f}", flush=True)

    times = []
    for t in range(args.trials):
        k = jax.random.fold_in(key, 100 + t)
        t0 = time.time()
        acc, _ = run(state, batch, k)
        acc = float(acc)  # force
        dt = time.time() - t0
        times.append(dt / args.steps)
        print(f"trial {t}: {dt/args.steps:.3f} s/step (acc {acc:.4f})", flush=True)
    print(f"BEST: {min(times):.3f} s/step")


if __name__ == "__main__":
    main()
