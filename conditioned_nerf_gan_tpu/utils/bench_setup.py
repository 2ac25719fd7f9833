"""Shared train-step benchmark setup.

One place to build (models, step config, synthetic batch) for a thousand-
curriculum stage, used by both `scripts/bench_train_step.py` (the ablation
CLI) and `bench.py` (the driver-captured regression tripwire) so the two
can never drift apart on alias resolution, voxel-vs-pcl conditioning, or
the density-noise gate.

Methodology contract (CLAUDE.md): callers must chain steps inside ONE
jitted `lax.fori_loop` with the TrainState as the data dependence and pass
every big array as a jit ARGUMENT (the remote compile helper rejects large
closure constants).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def build_stage_bench(
    stage: int = 2,
    config: str | None = None,
    config_base: str = "thousand",
    pcl_points: int = 65536,
    meta_overrides: dict | None = None,
    force_pallas: bool | None = None,
    save_siren_outputs: bool = False,
):
    """Build the full-GAN bench workload for a curriculum stage.

    Returns (gen, enc, disc, cfg, batch, meta): Flax modules, the
    TrainStepConfig (with the trainer's static density-noise gate applied),
    a synthetic host batch shaped like the stage's real one, and the
    resolved metadata dict.
    """
    import jax.numpy as jnp

    from ..config import extract_metadata, load_curriculum
    from ..config.presets import resolve_siren_alias
    from ..models import (
        ImplicitGenerator3d,
        ResnetPointnet,
        make_discriminator,
        make_unet,
    )
    from ..training import TrainStepConfig
    from ..training.schedules import nerf_noise_schedule

    cur = load_curriculum(config_base=config_base, config=config)
    stage_steps = sorted(k for k in cur if isinstance(k, int))
    step_at = stage_steps[stage]
    meta = extract_metadata(cur, step_at)
    if meta_overrides:
        meta.update(meta_overrides)
    # mirror the trainer's static density-noise gate (the schedule hits 0 at
    # step 5000, so stages 1+ skip the threefry + x0 multiply)
    density_noise = float(nerf_noise_schedule(step_at)) > 0.0

    dtype_name = meta.get("compute_dtype")
    compute_dtype = jnp.dtype(dtype_name) if dtype_name else None
    gen_meta = meta["generator"]
    use_pallas = meta.get("use_pallas", False)
    if force_pallas is not None:
        use_pallas = force_pallas
    gen = ImplicitGenerator3d(
        siren_type=resolve_siren_alias(gen_meta["siren_type"]),
        z_dim=gen_meta["z_dim"],
        input_dim=gen_meta.get("input_dim", 3),
        output_dim=gen_meta.get("output_dim", 4),
        hidden_dim=gen_meta.get("hidden_dim", 256),
        compute_dtype=compute_dtype,
        use_fast_sin=meta.get("use_fast_sin", False),
        use_pallas=use_pallas,
    )
    load_voxel = meta["dataset"].get("load_voxel", False)
    if load_voxel:
        enc = make_unet(dtype=compute_dtype, **meta["unet"])
    else:
        enc = ResnetPointnet(c_dim=gen_meta["z_dim"], dtype=compute_dtype)
    disc = (make_discriminator(meta["discriminator"], dtype=compute_dtype)
            if meta["enable_discriminator"] else None)

    cfg = TrainStepConfig.from_metadata(meta)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(
            cfg.render, density_noise=density_noise,
            save_siren_outputs=(save_siren_outputs
                                or cfg.render.save_siren_outputs),
        )
    )

    B = meta["batch_size"]
    img = meta["img_size"]
    rng = np.random.default_rng(0)
    batch = {
        "img": rng.uniform(-1, 1, (B, img, img, 3)).astype(np.float32),
        "cam2world": np.broadcast_to(
            np.eye(4, dtype=np.float32), (B, 4, 4)).copy(),
    }
    if load_voxel:
        vres = meta.get("voxel_resolution", 64)
        batch["voxel"] = rng.uniform(
            0, 1, (B, vres, vres, vres, 4)).astype(np.float32)
    else:
        n_pts = max(1, int(pcl_points * meta.get("num_points_ratio", 1.0)))
        batch["pcl"] = rng.uniform(
            -0.4, 0.4, (B, n_pts, 6)).astype(np.float32)
    return gen, enc, disc, cfg, batch, meta
