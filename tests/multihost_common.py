"""Shared model/batch builders for the multi-host parity harness.

Used both by tests/multihost_worker.py (the 2-process subprocesses) and
tests/test_multihost.py (the in-process single-process reference), so the
two sides are guaranteed to run the identical program on identical data.

fp32 models (no bf16 policy): the parity check compares a gloo cross-process
psum against a shared-memory single-process psum, and fp32 keeps the
reduction-order tolerance tight.
"""

from __future__ import annotations

import numpy as np

N_GLOBAL_DEVICES = 8
GLOBAL_BATCH = 8
IMG_SIZE = 16
SEED = 0


def build_models():
    from conditioned_nerf_gan_tpu.models import (
        ImplicitGenerator3d,
        ResnetPointnet,
        make_discriminator,
    )

    gen = ImplicitGenerator3d(siren_type="SHORTSIREN", z_dim=64, hidden_dim=64)
    enc = ResnetPointnet(c_dim=64, hidden_dim=32)
    disc = make_discriminator("ProgressiveDiscriminator")
    return gen, enc, disc


def build_config():
    from conditioned_nerf_gan_tpu.models import RenderConfig
    from conditioned_nerf_gan_tpu.training import TrainStepConfig

    return TrainStepConfig(
        render=RenderConfig(
            img_size=IMG_SIZE, num_steps=8, fov=49.134342641202636,
            ray_start=0.25, ray_end=1.95, hierarchical_sample=True,
            white_back=True,
        ),
        batch_split=1, enable_discriminator=True, photo_loss=True,
        load_pcl=True, r1_lambda=10.0, z_reg_weight=0.01, remat=True,
    )


def global_batch() -> dict:
    rng = np.random.default_rng(SEED)
    cams = np.broadcast_to(np.eye(4, dtype=np.float32),
                           (GLOBAL_BATCH, 4, 4)).copy()
    return {
        "img": rng.uniform(-1, 1, (GLOBAL_BATCH, IMG_SIZE, IMG_SIZE, 3)).astype(
            np.float32),
        "cam2world": cams,
        "pcl": rng.uniform(-0.3, 0.3, (GLOBAL_BATCH, 128, 6)).astype(np.float32),
    }


def run_one_step(mesh, local_or_global_batch: dict, force_global: bool = False):
    """Init state, run one train step over `mesh`; returns (metrics, flat params).

    `local_or_global_batch` is this process's shard (the full batch in
    single-process runs). Deterministic given SEED.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conditioned_nerf_gan_tpu.parallel import (
        compile_aligned,
        compile_train_step,
        shard_batch,
    )
    from conditioned_nerf_gan_tpu.training import create_train_state, make_train_step

    gen, enc, disc = build_models()
    cfg = build_config()
    key = np.asarray(jax.random.PRNGKey(SEED))

    init_fn = lambda k, b: create_train_state(k, gen, enc, disc, b, cfg)  # noqa: E731
    repl = NamedSharding(mesh, P())
    # compile_aligned: leader-first compile + barrier so both processes enter
    # each executable's first run (= the gloo 30 s rendezvous) together.
    init_jit = jax.jit(init_fn, out_shardings=repl)
    state = compile_aligned(init_jit, key, global_batch())(key, global_batch())

    sharded = shard_batch(local_or_global_batch, mesh, force_global=force_global)
    step_jit = compile_train_step(make_train_step(gen, enc, disc, cfg), mesh)
    step_fn = compile_aligned(step_jit, state, sharded, key,
                              np.float32(0.5), np.float32(0.5))
    state, metrics = step_fn(state, sharded, key,
                             np.float32(0.5), np.float32(0.5))
    jax.block_until_ready(metrics)
    metrics = {k: float(v) for k, v in metrics.items()}
    flat = np.concatenate([
        np.asarray(jax.device_get(leaf), dtype=np.float32).ravel()
        for leaf in jax.tree.leaves(
            {"G": state.params_G, "E": state.params_E, "D": state.params_D})
    ])
    return metrics, flat


def run_one_step_manual(mesh, local_or_global_batch: dict,
                        force_global: bool = False) -> dict:
    """One MANUAL (shard_map) train step over `mesh` — the composition the
    Pallas FiLM-SIREN kernel requires (GSPMD cannot partition Mosaic
    custom calls). Validates that the explicit pmean collectives inside
    shard_map cross the process boundary; returns the step metrics.
    """
    import dataclasses

    import jax

    from conditioned_nerf_gan_tpu.parallel import (
        compile_aligned,
        compile_train_step,
        shard_batch,
    )
    from conditioned_nerf_gan_tpu.training import create_train_state, make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    gen, enc, disc = build_models()
    gen = dataclasses.replace(gen, use_pallas=True)  # kernel self-gates off-TPU
    cfg = build_config()
    key = np.asarray(jax.random.PRNGKey(SEED))

    init_fn = lambda k, b: create_train_state(k, gen, enc, disc, b, cfg)  # noqa: E731
    repl = NamedSharding(mesh, P())
    init_jit = jax.jit(init_fn, out_shardings=repl)
    state = compile_aligned(init_jit, key, global_batch())(key, global_batch())

    sharded = shard_batch(local_or_global_batch, mesh, force_global=force_global)
    step_jit = compile_train_step(
        make_train_step(gen, enc, disc, cfg, axis_name="data"),
        mesh, manual=True,
    )
    step_fn = compile_aligned(step_jit, state, sharded, key,
                              np.float32(0.5), np.float32(0.5))
    state, metrics = step_fn(state, sharded, key,
                             np.float32(0.5), np.float32(0.5))
    jax.block_until_ready(metrics)
    return {k: float(v) for k, v in metrics.items()}
