#!/usr/bin/env python
"""Per-op attribution of the stage-2 train step (re-runnable roofline).

Captures a jax.profiler trace of a few stage-2 train steps on the TPU (the
tunnel forwards device events — verified r2) and prints the top device ops
by total time, grouped into budget buckets (MXU matmuls / sin chains /
gather-scatter / elementwise / other). This is the evidence behind the
BASELINE.md render-backward roofline: anyone can re-run it and re-derive
the bucket totals.

Usage: python scripts/profile_stage2.py [--stage 2] [--steps 3] [--top 25]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import tempfile
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp


def capture(stage: int, steps: int, out_dir: str) -> None:
    from conditioned_nerf_gan_tpu.config import extract_metadata, load_curriculum
    from conditioned_nerf_gan_tpu.models import (
        ImplicitGenerator3d, ResnetPointnet, make_discriminator,
    )
    from conditioned_nerf_gan_tpu.training import (
        TrainStepConfig, create_train_state, make_train_step,
    )
    from conditioned_nerf_gan_tpu.training.schedules import nerf_noise_schedule
    import dataclasses

    cur = load_curriculum(config_base="thousand")
    step_at = sorted(k for k in cur if isinstance(k, int))[stage]
    meta = extract_metadata(cur, step_at)
    dt = jnp.dtype(meta["compute_dtype"]) if meta.get("compute_dtype") else None
    g = meta["generator"]
    gen = ImplicitGenerator3d(
        siren_type=g["siren_type"], z_dim=g["z_dim"],
        hidden_dim=g.get("hidden_dim", 256), compute_dtype=dt,
        use_fast_sin=meta.get("use_fast_sin", False),
    )
    enc = ResnetPointnet(c_dim=g["z_dim"], dtype=dt)
    disc = make_discriminator(meta["discriminator"], dtype=dt)
    cfg = TrainStepConfig.from_metadata(meta)
    cfg = dataclasses.replace(cfg, render=dataclasses.replace(
        cfg.render, density_noise=float(nerf_noise_schedule(step_at)) > 0.0))

    B, img = meta["batch_size"], meta["img_size"]
    n_pts = max(1, int(65536 * meta.get("num_points_ratio", 1.0)))
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.uniform(-1, 1, (B, img, img, 3)).astype(np.float32),
        "cam2world": np.broadcast_to(np.eye(4, dtype=np.float32), (B, 4, 4)).copy(),
        "pcl": rng.uniform(-0.4, 0.4, (B, n_pts, 6)).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    state = jax.jit(lambda k, b: create_train_state(k, gen, enc, disc, b, cfg))(
        key, batch)
    step_fn = jax.jit(make_train_step(gen, enc, disc, cfg))
    # warm up (compile outside the trace)
    state, m = step_fn(state, batch, key, jnp.float32(0.5), jnp.float32(0.0))
    jax.block_until_ready(m)

    jax.profiler.start_trace(out_dir)
    for i in range(steps):
        state, m = step_fn(state, batch, jax.random.fold_in(key, i),
                           jnp.float32(0.5), jnp.float32(0.0))
    jax.block_until_ready(m)
    jax.profiler.stop_trace()


BUCKETS = (
    ("matmul (MXU)", ("dot", "convolution", "fusion.matmul")),
    ("gather/scatter/sort", ("gather", "scatter", "sort")),
    ("copy/transpose", ("copy", "transpose", "bitcast", "reshape")),
)


def analyze(trace_dir: str, steps: int, top: int) -> None:
    paths = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # device-side complete events only (TensorFlow-op rows carry 'dur')
    per_op: dict[str, float] = defaultdict(float)
    pid_names = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    device_pids = {p for p, name in pid_names.items()
                   if "TPU" in name or "/device" in name.lower()}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        per_op[e["name"]] += e["dur"]  # microseconds

    total = sum(per_op.values())
    print(f"device total: {total/1e3/steps:.1f} ms/step over {steps} steps "
          f"({len(per_op)} distinct ops)")
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    print(f"\ntop {top} ops (ms/step):")
    for name, dur in ranked[:top]:
        print(f"  {dur/1e3/steps:8.2f}  {name[:110]}")

    print("\nbuckets (ms/step):")
    rest = total
    for label, keys in BUCKETS:
        t = sum(d for nm, d in per_op.items()
                if any(k in nm.lower() for k in keys))
        rest -= t
        print(f"  {t/1e3/steps:8.2f}  {label}")
    print(f"  {rest/1e3/steps:8.2f}  elementwise/other (incl. sin chains)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", type=str, default=None,
                    help="analyze an existing trace instead of capturing")
    args = ap.parse_args()
    if args.trace_dir is None:
        args.trace_dir = tempfile.mkdtemp(prefix="stage2_trace_")
        print("capturing trace to", args.trace_dir)
        capture(args.stage, args.steps, args.trace_dir)
    analyze(args.trace_dir, args.steps, args.top)


if __name__ == "__main__":
    main()
