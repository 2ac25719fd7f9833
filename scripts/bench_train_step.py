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

import numpy as np

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

    from conditioned_nerf_gan_tpu.config import extract_metadata, load_curriculum
    from conditioned_nerf_gan_tpu.config.presets import resolve_siren_alias
    from conditioned_nerf_gan_tpu.models import (
        ImplicitGenerator3d, ResnetPointnet, make_discriminator, make_unet,
    )
    from conditioned_nerf_gan_tpu.training import (
        TrainStepConfig, create_train_state, make_train_step,
    )

    cur = load_curriculum(config_base="thousand", config=args.config)
    stage_steps = sorted(k for k in cur if isinstance(k, int))
    step_at = stage_steps[args.stage]
    meta = extract_metadata(cur, step_at)
    # mirror the trainer's static density-noise gate (schedule hits 0 at
    # step 5000, so stages 1+ skip the threefry + x0 multiply)
    from conditioned_nerf_gan_tpu.training.schedules import nerf_noise_schedule
    density_noise = float(nerf_noise_schedule(step_at)) > 0.0
    if args.fp32:
        meta["compute_dtype"] = None
    if args.no_disc:
        meta["enable_discriminator"] = False
    if args.no_hier:
        meta["hierarchical_sample"] = False
    if args.no_photo:
        meta["photo_loss"] = False
    if args.split is not None:
        meta["batch_split"] = args.split
    if args.chunks is not None:
        meta["ray_chunks"] = args.chunks
    if args.batch is not None:
        meta["batch_size"] = args.batch

    dtype_name = meta.get("compute_dtype")
    compute_dtype = jnp.dtype(dtype_name) if dtype_name else None
    gen_meta = meta["generator"]
    gen = ImplicitGenerator3d(
        siren_type=resolve_siren_alias(gen_meta["siren_type"]),
        z_dim=gen_meta["z_dim"],
        input_dim=gen_meta.get("input_dim", 3),
        output_dim=gen_meta.get("output_dim", 4),
        hidden_dim=gen_meta.get("hidden_dim", 256),
        compute_dtype=compute_dtype,
        use_fast_sin=meta.get("use_fast_sin", False),
        use_pallas=(args.pallas or meta.get("use_pallas", False))
        and not args.no_pallas,
    )
    load_voxel = meta["dataset"].get("load_voxel", False)
    if load_voxel:
        enc = make_unet(dtype=compute_dtype, **meta["unet"])
    else:
        enc = ResnetPointnet(c_dim=gen_meta["z_dim"], dtype=compute_dtype)
    disc = (make_discriminator(meta["discriminator"], dtype=compute_dtype)
            if meta["enable_discriminator"] else None)
    import dataclasses
    cfg = TrainStepConfig.from_metadata(meta)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, density_noise=density_noise,
            save_siren_outputs=args.save_outputs or cfg.render.save_siren_outputs,
        )
    )

    B = meta["batch_size"]
    img = meta["img_size"]
    n_pts = max(1, int(args.pcl_points * meta.get("num_points_ratio", 1.0)))
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.uniform(-1, 1, (B, img, img, 3)).astype(np.float32),
        "cam2world": np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy(),
    }
    if load_voxel:
        vres = meta.get("voxel_resolution", 64)
        batch["voxel"] = rng.uniform(0, 1, (B, vres, vres, vres, 4)).astype(np.float32)
        cond_desc = f"voxel {vres}^3"
    else:
        batch["pcl"] = rng.uniform(-0.4, 0.4, (B, n_pts, 6)).astype(np.float32)
        cond_desc = f"pcl {n_pts}"
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
