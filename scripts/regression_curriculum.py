#!/usr/bin/env python
"""Full-curriculum TPU regression on the SHIPPED preset stack.

Drives one real Trainer run through ALL curriculum stages with the
milestones compressed to `--steps_per_stage`-step stages (the reference's
0/5k/15k/25k schedule at 10-step scale): every per-stage shape (img_size,
batch_size, batch_split, num_steps, lrs) is the preset's own, so the run
exercises exactly the executables, milestone reloads/recompiles, chained
steps_per_dispatch windows, sample/print/eval gates, and (by default) the
in-training `Trainer.evaluate` FID protocol that a production run uses —
reference train.py:77-122 + utils.py:974-1016 at compressed horizon.

Per-stage in-run sec/step comes from the trainer's own stats table
(print_freq = steps_per_stage → one print per stage, draining the async
metric queue inside the timed region). The summary JSON line at the end is
the artifact recorded in BASELINE.md.

Serialize this with everything else on the chip (CLAUDE.md: concurrent
tunnel jobs distort each other 20-40%).

Sizing: chained windows cannot span epochs, so each stage needs
floor(cars*(views-1)/batch_size) >= steps_per_dispatch batches per epoch
or the chained path silently falls back per-step (the summary's
chain_dispatches exposes this; ok=false when it never chained). The real
dataset has 24 views/car — use --views 24 with enough cars.

Usage:
  python scripts/regression_curriculum.py --out /tmp/reg_r5
      [--config dg_shortsiren_dis] [--steps_per_stage 10] [--cars 8]
      [--views 8] [--img 64] [--points 2048] [--no_eval] [--seed 0]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, required=True)
    ap.add_argument("--config", type=str, default=None,
                    help="thousand experiment overlay (default: stock preset)")
    ap.add_argument("--config_base", type=str, default="thousand",
                    help="preset base (smoke = CPU-sized protocol dry run)")
    ap.add_argument("--platform", type=str, default=None,
                    choices=[None, "cpu", "tpu"])
    ap.add_argument("--steps_per_stage", type=int, default=10,
                    help=">= steps_per_dispatch so full chained windows fit")
    ap.add_argument("--cars", type=int, default=8)
    ap.add_argument("--views", type=int, default=8)
    ap.add_argument("--img", type=int, default=64)
    ap.add_argument("--points", type=int, default=2048)
    ap.add_argument("--spd", type=int, default=None,
                    help="override steps_per_dispatch (default: preset's)")
    ap.add_argument("--prints_per_stage", type=int, default=1,
                    help="2+: sub-stage stats prints, so the LAST print of "
                         "each stage excludes its milestone recompile (the "
                         "steady-state in-run number for BASELINE)")
    ap.add_argument("--no_eval", action="store_true",
                    help="skip the end-of-run Trainer.evaluate FID protocol")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from conditioned_nerf_gan_tpu.utils import setup_compile_cache

    setup_compile_cache(Path(__file__).resolve().parent.parent / ".jax_cache")

    from conditioned_nerf_gan_tpu.config import (
        curriculum_to_json,
        load_curriculum,
    )
    from conditioned_nerf_gan_tpu.data import make_synthetic_shapenet
    from conditioned_nerf_gan_tpu.training import Trainer

    ds_root = make_synthetic_shapenet(
        out / "data", n_cars=args.cars, n_views=args.views,
        img_size=args.img, n_points=args.points, seed=args.seed,
    )
    os.environ["CNG_DATASET_PATH"] = str(ds_root)

    # compress the milestone STEPS, keep every per-stage dict intact
    cur = load_curriculum(config_base=args.config_base, config=args.config)
    stages = sorted(k for k in cur if isinstance(k, int))
    compressed = {}
    for i, k in enumerate(stages):
        compressed[i * args.steps_per_stage] = cur.pop(k)
    cur.update(compressed)
    if args.spd is not None:
        cur["steps_per_dispatch"] = args.spd
    cur_path = out / "curriculum_compressed.json"
    curriculum_to_json(cur, cur_path)

    sps = args.steps_per_stage
    total = sps * len(stages)
    pf = max(1, sps // max(1, args.prints_per_stage))
    t_args = types.SimpleNamespace(
        output_dir=str(out / "run"), load_dir="", load_curriculum=str(cur_path),
        sampling_interval=2 * sps, print_freq=pf,
        eval_freq=(total if not args.no_eval else 10 * total),
        n_epochs=10_000, stop_step=total - 1, config=args.config,
        config_base=args.config_base, seed=args.seed,
    )
    trainer = Trainer(t_args)

    # one stats print per stage: stash its in-run sec/step as it prints
    stage_secs = []
    orig_print_stats = trainer.print_stats

    def print_stats(steps_elapsed):
        r = orig_print_stats(steps_elapsed)
        if r is not None:
            stage_secs.append(
                {"step": trainer.step, "img": trainer.metadata["img_size"],
                 "batch": trainer.metadata["batch_size"],
                 "sec_per_step": round(steps_elapsed / pf, 4)}
            )
        return r

    trainer.print_stats = print_stats
    trainer.load_models()
    trainer.train()

    import numpy as np

    photo = np.asarray(trainer.histories["photometry_losses"], np.float64)
    g = np.asarray(trainer.histories["generator_losses"], np.float64)
    d = np.asarray(trainer.histories["discriminator_losses"], np.float64)
    ok = (
        len(photo) == total
        and np.isfinite(photo).all() and np.isfinite(g).all()
        and np.isfinite(d).all()
        and trainer._chain_dispatches > 0
    )
    summary = {
        "ok": bool(ok),
        "config": args.config or args.config_base,
        "steps": total,
        "chain_dispatches": trainer._chain_dispatches,
        "effective_steps_per_dispatch": trainer._chain_k,
        "stages": stage_secs,
        "photo_first_last": [round(float(photo[:sps].mean()), 4),
                             round(float(photo[-sps:].mean()), 4)],
        "g_first_last": [round(float(g[:sps].mean()), 4),
                         round(float(g[-sps:].mean()), 4)],
        "d_first_last": [round(float(d[:sps].mean()), 4),
                         round(float(d[-sps:].mean()), 4)],
    }
    if not args.no_eval:
        fid_hist = trainer.histories.get("fid_history") or []
        summary["eval"] = (
            [round(float(x), 4) for x in fid_hist[-1]] if fid_hist else None
        )
        summary["ok"] = bool(summary["ok"] and fid_hist)
    print("REGRESSION_SUMMARY " + json.dumps(summary))
    sys.exit(0 if summary["ok"] else 1)


if __name__ == "__main__":
    main()
