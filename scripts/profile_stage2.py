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


def capture(stage: int, steps: int, out_dir: str, spd: int = 1) -> None:
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
        use_pallas=meta.get("use_pallas", False),
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
    if spd > 1:
        # chained-window variant (the shipped steps_per_dispatch path):
        # trace the scanned program so per-op attribution covers the scan
        # body XLA actually fuses, not the standalone step
        from conditioned_nerf_gan_tpu.training.train_step import (
            make_chained_step,
        )

        step_fn = jax.jit(make_chained_step(make_train_step(gen, enc, disc, cfg)))
        batch = {k: np.broadcast_to(v, (spd,) + v.shape).copy()
                 for k, v in batch.items()}
        alphas = np.full((spd,), 0.5, np.float32)
        noises = np.zeros((spd,), np.float32)
        state, m = step_fn(state, batch, key, alphas, noises)
        jax.block_until_ready(m)
        jax.profiler.start_trace(out_dir)
        for i in range(steps):
            state, m = step_fn(state, batch, jax.random.fold_in(key, i),
                               alphas, noises)
        jax.block_until_ready(m)
        jax.profiler.stop_trace()
        return

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
    # leaf XLA ops only — the trace also carries module/step container rows
    # ("jit_train_step", "while.N") that would double-count
    per_op: dict[str, float] = defaultdict(float)
    tid_names = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and "args" in e and "tid" in e
    }
    op_tids = {k for k, name in tid_names.items() if "XLA Ops" in name}
    assert op_tids, f"no 'XLA Ops' thread rows; threads: {set(tid_names.values())}"
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        per_op[e["name"]] += e["dur"]  # microseconds

    # while.* rows are containers whose inner ops appear as separate events
    # on the same thread — split them out and attribute leaves by timestamp
    whiles = []
    leaves = []
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        (whiles if e["name"].startswith("while") else leaves).append(e)

    leaf_total = sum(e["dur"] for e in leaves)
    print(f"device leaf total: {leaf_total/1e3/steps:.1f} ms/step over "
          f"{steps} steps ({len(per_op)} distinct ops)")
    spans = defaultdict(list)
    for e in whiles:
        spans[e["name"]].append((e["ts"], e["ts"] + e["dur"]))
    print("\nloop containers (ms/step):")
    for name in sorted(spans, key=lambda n: -sum(b - a for a, b in spans[n])):
        t = sum(b - a for a, b in spans[name])
        print(f"  {t/1e3/steps:8.2f}  {name}  (x{len(spans[name])})")

    def container_of(e):
        for name, ss in spans.items():
            for a, b in ss:
                if a <= e["ts"] and e["ts"] + e["dur"] <= b:
                    return name
        return "<top-level>"

    per_scope: dict[str, dict[str, float]] = defaultdict(
        lambda: defaultdict(float))
    for e in leaves:
        per_scope[container_of(e)][e["name"]] += e["dur"]

    for scope in sorted(per_scope,
                        key=lambda s: -sum(per_scope[s].values())):
        ops = per_scope[scope]
        t_scope = sum(ops.values())
        print(f"\n=== {scope}: {t_scope/1e3/steps:.1f} ms/step ===")
        for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {dur/1e3/steps:8.2f}  {name[:100]}")
        print("  buckets:", end="")
        rest = t_scope
        for label, keys in BUCKETS:
            t = sum(d for nm, d in ops.items()
                    if any(k in nm.lower() for k in keys))
            rest -= t
            print(f"  {label}={t/1e3/steps:.1f}", end="")
        print(f"  elementwise/other={rest/1e3/steps:.1f}  (ms/step)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=2)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", type=str, default=None,
                    help="analyze an existing trace instead of capturing")
    ap.add_argument("--spd", type=int, default=1,
                    help=">1: profile the steps_per_dispatch chained "
                         "program (one scanned dispatch of spd steps) "
                         "instead of the standalone step")
    args = ap.parse_args()
    if args.trace_dir is None:
        args.trace_dir = tempfile.mkdtemp(prefix="stage2_trace_")
        print("capturing trace to", args.trace_dir)
        capture(args.stage, args.steps, args.trace_dir, spd=args.spd)
    # per-step normalization: a chained dispatch carries spd steps
    analyze(args.trace_dir, args.steps * args.spd, args.top)


if __name__ == "__main__":
    main()
