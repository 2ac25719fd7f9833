#!/usr/bin/env python
"""Train the conditioned NeRF-GAN.

CLI parity with reference train.py:146-246 (`-o/-s/-p/-e/-l`,
--load_curriculum, --n_epochs, --stop_step, --config, --config_base), with
TPU-native replacements for the process plumbing:
  * no mp.spawn / gloo rendezvous (train.py:36-44, 231-246) — data
    parallelism is a jit over the device mesh; multi-host runs shard input by
    jax.process_index().
  * `--platform cpu` switches to the local CPU backend (the env var is
    hijacked on this machine's image).
  * `--smoke` generates a synthetic dataset and runs the reference's
    "test if settings are installed correct" flow (README:50-52:
    `python train.py -o test -p 1`).
"""

from __future__ import annotations

import argparse
import os
from datetime import datetime
from pathlib import Path


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train conditioned NeRF-GAN (TPU)")
    parser.add_argument("-s", "--sampling_interval", type=int, default=200,
                        help="step interval between sample-image dumps")
    parser.add_argument("-p", "--print_freq", type=int, default=100,
                        help="step interval between stats prints")
    parser.add_argument("-e", "--eval_freq", type=int, default=5000,
                        help="step interval between FID eval + checkpoint")
    parser.add_argument("-o", "--output_dir", type=str, required=True,
                        help="output directory (also the resume anchor)")
    parser.add_argument("-l", "--load_dir", type=str, default="",
                        help="absolute path to a checkpoint (.ckpt)")
    parser.add_argument("--load_curriculum", type=str, default="",
                        help="explicit curriculum JSON (overrides all other sources)")
    parser.add_argument("--n_epochs", type=int, default=3000)
    parser.add_argument("--stop_step", type=int, default=None)
    parser.add_argument("--config", type=str, default=None,
                        help="experiment config name within the config base")
    parser.add_argument("--config_base", type=str, default="thousand")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a JAX/xprof profiler trace of steps "
                             "10-15 into this directory")
    parser.add_argument("--platform", type=str, default=None,
                        choices=[None, "cpu", "tpu"],
                        help="force a JAX platform (default: environment)")
    parser.add_argument("--smoke", action="store_true",
                        help="generate a tiny synthetic dataset and train on it")
    parser.add_argument("--native_loader", action="store_true",
                        help="decode PNGs/EXRs through the C++ thread-pool "
                             "loader (native/fastload.cc), one batched call "
                             "per field instead of per-sample Python decodes; "
                             "the TPU replacement for the reference's 8 "
                             "DataLoader workers (env: CNG_NATIVE_LOADER=1)")
    # multi-host execution (replaces the reference's mp.spawn + gloo
    # rendezvous, train.py:36-44,231-246): launch this CLI once per host.
    parser.add_argument("--distributed", action="store_true",
                        help="call jax.distributed.initialize(); on TPU pod "
                             "slices the topology is auto-detected")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="coordinator address host:port (implies "
                             "--distributed; env: CNG_COORDINATOR)")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="total process count (env: CNG_NUM_PROCESSES)")
    parser.add_argument("--process_id", type=int, default=None,
                        help="this process's id (env: CNG_PROCESS_ID)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    os.makedirs(os.path.join(args.output_dir, "logs"), exist_ok=True)

    if args.native_loader:
        os.environ["CNG_NATIVE_LOADER"] = "1"

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from conditioned_nerf_gan_tpu.utils import setup_compile_cache

    setup_compile_cache()

    from conditioned_nerf_gan_tpu.parallel import (
        distributed_requested,
        initialize_distributed,
    )

    if distributed_requested(args):
        initialize_distributed(args.coordinator, args.num_processes,
                               args.process_id)
        print(f"Distributed: process {jax.process_index()}/"
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices", flush=True)

    if args.smoke:
        from conditioned_nerf_gan_tpu.data import make_synthetic_shapenet

        data_root = Path(args.output_dir) / "synthetic_data"
        ds_root = data_root / "ShapeNetCar"
        if not ds_root.exists():
            print("Generating synthetic smoke dataset ...")
            make_synthetic_shapenet(data_root, n_cars=6, n_views=8,
                                    img_size=64, n_points=2048)
        os.environ["CNG_DATASET_PATH"] = str(ds_root)
        if args.config_base == "thousand":
            args.config_base = "smoke"

    # seed the host RNGs per process (reference train.py:71-72): everything
    # device-side already flows from PRNGKey(seed); this pins the host-side
    # consumers (dataset shuffles already take seed= explicitly, this covers
    # any library-level random/np.random use)
    import random

    import numpy as np

    random.seed(args.seed + jax.process_index())
    np.random.seed(args.seed + jax.process_index())

    from conditioned_nerf_gan_tpu.training import Trainer

    print(f"Devices: {jax.devices()}")
    print(datetime.now().strftime("%d--%H:%M"))
    print("---------------- Start training ----------------", flush=True)

    trainer = Trainer(
        args,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
    )
    trainer.load_models()
    trainer.train()


if __name__ == "__main__":
    main()
