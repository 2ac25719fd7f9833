#!/usr/bin/env python
"""Inference CLI.

Parity with reference inference.py:844-955: per-seed rendering of image
grids (fixed/random cameras), orbit videos, colored point clouds, density
voxels, metrics, and latent interpolation from a training checkpoint.
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Inference conditioned NeRF-GAN")
    parser.add_argument("path", type=str, help="path to the checkpoint .ckpt")
    parser.add_argument("--sampling_mode", type=str, default="val",
                        help="which ShapeNet split list to sample from")
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--ray_step_multiplier", type=int, default=1)
    parser.add_argument("--z_up", action="store_true")
    parser.add_argument("--colored_pcl", action="store_true",
                        help="kept for reference CLI parity; inert there too "
                             "(inference.py:122 stores it, nothing reads it)")
    parser.add_argument("--images", action="store_true")
    parser.add_argument("--num_imgs", type=int, default=8)
    parser.add_argument("--cam_fixed", action="store_true")
    parser.add_argument("--video", action="store_true")
    parser.add_argument("--num_frames", type=int, default=240)
    parser.add_argument("--fps", type=int, default=24)
    parser.add_argument("--pcl", action="store_true")
    parser.add_argument("--pcl_masked", action="store_true",
                        help="colored pcl from dataset views, masked by GT depth")
    parser.add_argument("--pcl_views", type=int, default=20)
    parser.add_argument("--voxel", action="store_true")
    parser.add_argument("--cube_size", type=float, default=1.2)
    parser.add_argument("--voxel_resolution", type=int, default=48)
    parser.add_argument("--input_voxel_resolution", type=int, default=64)
    parser.add_argument("--metrics", action="store_true")
    parser.add_argument("--shard_rays", action="store_true",
                        help="split each render's pixel rows over all devices")
    parser.add_argument("--interpolate", action="store_true")
    parser.add_argument("--interpolate_src", type=str, default=None)
    parser.add_argument("--interpolate_tgt", type=str, default=None)
    parser.add_argument("--seeds", nargs="+", default=[0])
    parser.add_argument("--platform", type=str, default=None,
                        choices=[None, "cpu", "tpu"])
    parser.add_argument("--native_loader", action="store_true",
                        help="decode dataset PNGs/EXRs through the C++ "
                             "thread-pool loader (env: CNG_NATIVE_LOADER=1)")
    return parser.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)
    print(opt)

    if opt.native_loader:
        os.environ["CNG_NATIVE_LOADER"] = "1"

    import jax

    if opt.platform:
        jax.config.update("jax_platforms", opt.platform)

    from conditioned_nerf_gan_tpu.utils import setup_compile_cache

    setup_compile_cache()

    from conditioned_nerf_gan_tpu.infer import Inferencer

    load_dataset = not opt.interpolate

    for seed in opt.seeds:
        seed = int(seed)
        random.seed(seed)
        np.random.seed(seed)
        inferencer = Inferencer(
            opt.path,
            sampling_mode=opt.sampling_mode,
            input_voxel_resolution=opt.input_voxel_resolution,
            z_up=opt.z_up,
            num_imgs=opt.num_imgs,
            image_size=opt.image_size,
            ray_step_multiplier=opt.ray_step_multiplier,
            load_dataset=load_dataset,
            seed=seed,
            shard_rays=opt.shard_rays,
        )
        if opt.images:
            inferencer.render_imgs(opt.cam_fixed)
        if opt.video:
            for idx in range(min(opt.num_imgs, 1)):
                inferencer.render_video(idx, opt.num_frames, opt.fps)
        if opt.pcl:
            inferencer.render_pcl(0, opt.pcl_views)
        if opt.pcl_masked:
            inferencer.render_pcl_masked(0, opt.pcl_views)
        if opt.voxel:
            inferencer.save_voxel(0, opt.cube_size, opt.voxel_resolution)
        if opt.metrics:
            inferencer.compute_metrics()
        if opt.interpolate:
            if not (opt.interpolate_src and opt.interpolate_tgt):
                raise SystemExit(
                    "--interpolate requires --interpolate_src and --interpolate_tgt"
                )
            inferencer.interpolate_latent_codes(
                opt.interpolate_src, opt.interpolate_tgt,
                inferencer.run_dir / "inference",
            )


if __name__ == "__main__":
    main()
