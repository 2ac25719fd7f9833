"""The jitted GAN train step (D update + G/E update).

Parity targets: reference utils.py:621-842 (`Trainer.train_generator` /
`train_discriminator`) and train.py:93-122 (D-then-G alternation):
  * D step: encoder + generator run without gradients; R1 penalty on real
    images with double backward; softplus D loss; global-norm grad clip; Adam
    (betas (0, 0.9)).
  * G step: encoder gradients flow through the render loss; softplus G loss +
    photometric MSE + weighted fg-masked depth MSE + latent-norm regularizer;
    per-split losses are means over the split and their gradients accumulate
    by summation (reference utils.py:642-711 semantics — the effective G/E
    gradient is batch_split × the full-batch-mean gradient), then one
    clip+Adam step for G and E each.

TPU-first design:
  * One pure function `(TrainState, batch, rng, scalars) → (TrainState,
    metrics)` compiled once per curriculum stage (shape-affecting options are
    static in TrainStepConfig; alpha / nerf_noise are traced).
  * batch_split becomes a `lax.scan` over sub-batches (gradient
    accumulation without Python-level loops), with optional rematerialization
    of the render pass to trade FLOPs for HBM.
  * No AMP GradScaler: TPUs train bf16/fp32 without loss scaling
    (reference's scaler plumbing at utils.py:726-741 is intentionally absent).
  * Data parallelism: jit + NamedSharding on the batch (parallel/mesh.py);
    XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..models.generator import RenderConfig
from ..models.pointnet import encode_pcl
from ..ops import create_cam2world_matrix, sample_camera_positions
from .losses import (
    depth_loss as fg_depth_loss,
    gan_d_loss,
    gan_g_loss,
    photometric_loss,
    r1_penalty,
)


@dataclasses.dataclass(frozen=True)
class TrainStepConfig:
    """Static per-stage options baked into the compiled train step.

    Everything that changes the compiled computation lives here — shapes
    (via RenderConfig), control flow, loss weights, AND optimizer
    hyperparameters (lrs/betas/weight_decay are compile-time constants in
    the jitted update). The trainer compares configs across curriculum
    milestones to decide when to recompile, so the dataclass being frozen
    and == -comparable is load-bearing: the reference re-applies *every*
    metadata field each step (train.py:82-88, utils.py:503-544), and any
    field changing at a milestone must trigger a rebuild here.
    """

    render: RenderConfig
    batch_split: int = 1
    enable_discriminator: bool = True
    photo_loss: bool = True
    use_depth_loss: bool = False
    depth_loss_weight: float = 1.0
    load_voxel: bool = False
    load_pcl: bool = True
    cond_mode: bool = False
    random_gen_img: bool = True
    noise_weight: float = 0.0
    r1_lambda: float = 10.0
    grad_clip: float = 1.0
    z_reg_weight: float = 0.01
    cam_r_start: float = 0.7
    cam_r_end: float = 1.5
    up_direction: str = "y"
    remat: bool = True
    # Effective G/E gradient = grad_accum_scale × full-batch mean. The
    # reference's accumulation sums per-split means (utils.py:642-711), so
    # its effective gradient is batch_split × mean — i.e. its tuned lrs bake
    # in the split factor. Decoupling lets presets pick batch_split for
    # memory/perf while keeping the reference's training dynamics
    # (default None → batch_split, exactly the reference semantics).
    grad_accum_scale: float | None = None
    # optimizer hyperparameters (reference utils.py:503-524 re-applies these
    # per step; here they recompile the step, which happens only at milestones)
    gen_lr: float = 2e-4
    disc_lr: float = 2e-4
    enc_lr: float = 2e-4
    betas: tuple = (0.0, 0.9)
    weight_decay: float = 0.0
    # pi-GAN's mapping-network stabilization trick: the SIREN mapping net
    # trains at gen_lr * mapping_lr_mult. The reference keeps the logic at
    # utils.py:507-509 but ships optimizer_G with a single anonymous param
    # group (utils.py:328-332), so the 5e-2 branch never fires there and the
    # mapping net actually trains at full gen_lr — the parity default is
    # therefore 1.0, with upstream pi-GAN's 5e-2 available as a real,
    # curriculum-controlled knob (metadata key "mapping_lr_mult").
    mapping_lr_mult: float = 1.0

    @classmethod
    def from_metadata(cls, metadata: dict, **overrides) -> "TrainStepConfig":
        render = RenderConfig.from_metadata(metadata)
        kwargs = dict(
            render=render,
            batch_split=metadata.get("batch_split", 1),
            enable_discriminator=metadata.get("enable_discriminator", True),
            photo_loss=metadata.get("photo_loss", False),
            use_depth_loss=metadata.get("depth_loss", False),
            depth_loss_weight=metadata.get("depth_loss_weight", 1.0),
            load_voxel=metadata["dataset"].get("load_voxel", False),
            load_pcl=metadata["dataset"].get("load_pcl", False),
            cond_mode=bool(metadata["dataset"].get("cond_mode", False)),
            random_gen_img=metadata.get("random_gen_img", True),
            noise_weight=metadata.get("noise_weight", 0.0),
            r1_lambda=metadata.get("r1_lambda", 10.0),
            grad_clip=metadata.get("grad_clip", 1.0),
            z_reg_weight=metadata.get("z_reg_weight", 0.0),
            cam_r_start=metadata.get("cam_r_start", 0.7),
            cam_r_end=metadata.get("cam_r_end", 1.5),
            grad_accum_scale=metadata.get("grad_accum_scale"),
            gen_lr=metadata["gen_lr"],
            disc_lr=metadata.get("disc_lr", metadata["gen_lr"]),
            enc_lr=metadata.get("enc_lr", metadata["gen_lr"]),
            betas=tuple(metadata.get("betas", (0.0, 0.9))),
            weight_decay=metadata.get("weight_decay", 0.0),
            mapping_lr_mult=metadata.get("mapping_lr_mult", 1.0),
        )
        kwargs.update(overrides)
        return cls(**kwargs)


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params_G: Any
    params_E: Any
    params_D: Any  # None when the discriminator is disabled
    opt_G: Any
    opt_E: Any
    opt_D: Any


def mapping_network_mask(params) -> Any:
    """Bool pytree: True on every leaf under a 'mapping_network' module."""
    def in_mapping(path, _):
        return any(str(getattr(k, "key", k)) == "mapping_network" for k in path)

    return jax.tree_util.tree_map_with_path(in_mapping, params)


def make_optimizer(lr: float, betas=(0.0, 0.9), weight_decay: float = 0.0,
                   grad_clip: float = 1.0, lr_mult_mask=None,
                   lr_mult: float = 1.0) -> optax.GradientTransformation:
    """clip_by_global_norm → (coupled L2) → Adam, matching torch
    clip_grad_norm_ + torch.optim.Adam (utils.py:328-332, 726-741).

    torch Adam's weight_decay is *coupled*: wd·param is added to the gradient
    before the Adam moments (not AdamW's decoupled decay), so it goes through
    add_decayed_weights ahead of scale_by_adam. `lr_mult_mask` applies
    `lr_mult` to the masked leaves (the pi-GAN mapping-network trick,
    reference utils.py:507-509).
    """
    txs = [optax.clip_by_global_norm(grad_clip)]
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
    if lr_mult_mask is not None:
        txs.append(optax.masked(optax.scale(lr_mult), lr_mult_mask))
    txs.append(optax.scale(-lr))
    return optax.chain(*txs)


def _make_txs(config: "TrainStepConfig"):
    """The three optimizer chains (G with the mapping-net lr mask, E, D)."""
    tx_G = make_optimizer(
        config.gen_lr, config.betas, config.weight_decay, config.grad_clip,
        lr_mult_mask=mapping_network_mask, lr_mult=config.mapping_lr_mult,
    )
    tx_E = make_optimizer(
        config.enc_lr, config.betas, config.weight_decay, config.grad_clip,
    )
    tx_D = make_optimizer(
        config.disc_lr, config.betas, config.weight_decay, config.grad_clip,
    )
    return tx_G, tx_E, tx_D


def create_train_state(
    rng: jax.Array,
    generator,
    encoder,
    discriminator,
    sample_batch: dict,
    config: TrainStepConfig,
) -> TrainState:
    """Initialize all params + optimizer chains from a sample batch."""
    k_g, k_e, k_d = jax.random.split(rng, 3)
    cams = jnp.asarray(sample_batch["cam2world"])
    B = cams.shape[0]

    if config.load_pcl:
        params_E = encoder.init(k_e, jnp.asarray(sample_batch["pcl"]))
        z = jnp.zeros((B, generator.z_dim))
    else:
        params_E = encoder.init(k_e, jnp.asarray(sample_batch["voxel"]))
        enc_out = jax.eval_shape(
            lambda p, v: encoder.apply(p, v), params_E,
            jnp.asarray(sample_batch["voxel"]),
        )
        # tree-map, not a flat loop: PyramidUNet3D returns
        # ([level0, level1, ...], global) — the pyramid list nests
        z = jax.tree.map(lambda o: jnp.zeros(o.shape, o.dtype), enc_out)
        if isinstance(z, list):
            z = tuple(z)

    params_G = generator.init(k_g, z, cams, config.render)
    tx_G, tx_E, tx_D = _make_txs(config)

    params_D = None
    opt_D = None
    if config.enable_discriminator:
        img = jnp.zeros(
            (B, config.render.img_size, config.render.img_size, 3)
        )
        cond = img if config.cond_mode else None
        params_D = discriminator.init(k_d, img, 1.0, cond=cond)
        opt_D = tx_D.init(params_D)

    opt_G = tx_G.init(params_G)
    opt_E = tx_E.init(params_E)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params_G=params_G, params_E=params_E, params_D=params_D,
        opt_G=opt_G, opt_E=opt_E, opt_D=opt_D,
    )


def make_train_step(
    generator,
    encoder,
    discriminator,
    config: TrainStepConfig,
    axis_name: str | None = None,
) -> Callable:
    """Build the per-stage train step. Compile with jit (see parallel.mesh).

    axis_name: when set, the step is built for `jax.shard_map` manual
    parallelism over that mesh axis — each device runs on its local batch
    shard, gradients/metrics are `pmean`ed across the axis before the
    optimizer update, and the device's RNG stream is decorrelated by
    folding `axis_index` into the step key. This is REQUIRED to compose
    data parallelism with the Pallas FiLM-SIREN kernel: Mosaic kernels
    cannot be partitioned by GSPMD (XLA raises "wrap the call in a
    shard_map"), so the GSPMD jit path (axis_name=None) is only valid for
    the pure-XLA formulation. Per-device noise/camera draws differ from
    the GSPMD path's global draws (different rng layout, same
    distribution) — the two paths are distribution-, not bit-,
    equivalent."""

    tx_G, tx_E, tx_D = _make_txs(config)

    def encode(params_E, chunk, key, with_noise: bool):
        """Encoder forward → (z, z_reg). Mirrors utils.py:644-654/:776-786."""
        if config.load_pcl:
            nw = config.noise_weight if with_noise else 0.0
            return encode_pcl(
                lambda p, x: encoder.apply(p, x), params_E, chunk["pcl"],
                noise_weight=nw, key=key,
            )
        z = encoder.apply(params_E, chunk["voxel"])
        if isinstance(z, list):
            z = tuple(z)
        return z, jnp.zeros(())

    def render(params_G, z, cams, key, nerf_noise):
        apply_fn = lambda p, zz, cc, kk: generator.apply(
            p, zz, cc, config.render, rng=kk, nerf_noise=nerf_noise,
            deterministic=False,
        )
        # With ray_chunks > 1 the generator already rematerializes per chunk
        # (models/generator.py chunk_fn); an outer checkpoint on top would
        # nominally recompute the whole render forward a third time in the
        # backward pass. Measured perf-neutral at stage 2 (XLA CSEs the
        # nested recompute), but skipping it keeps the graph honest and the
        # memory bound attributable to the per-chunk remat alone.
        if config.remat and config.render.ray_chunks <= 1:
            apply_fn = jax.checkpoint(apply_fn, static_argnums=())
        return apply_fn(params_G, z, cams, key)

    def disc_logits(params_D, imgs, alpha, cond):
        out = discriminator.apply(params_D, imgs, alpha, cond=cond)
        return out[0] if isinstance(out, tuple) else out

    def split_chunks(batch):
        """Reshape leading axis B → (batch_split, B/split) for lax.scan.

        Under manual sharding (axis_name set) B is the PER-DEVICE batch, so
        batch_split must divide global_batch / n_devices — fail with the
        real constraint instead of a bare reshape error."""
        k = config.batch_split

        def rs(x):
            if x.shape[0] % k:
                raise ValueError(
                    f"batch_split={k} must divide the "
                    f"{'per-device ' if axis_name else ''}batch {x.shape[0]}"
                )
            return x.reshape(k, x.shape[0] // k, *x.shape[1:])

        return jax.tree.map(rs, batch)

    # ------------------------------------------------------------------
    # D step (utils.py:743-842)
    # ------------------------------------------------------------------
    def discriminator_step(state, batch, key, alpha, nerf_noise):
        real_imgs = batch["img"]
        cond = batch.get("cond") if config.cond_mode else None
        B = real_imgs.shape[0]
        k_cam, k_enc, k_render = jax.random.split(key, 3)

        if config.random_gen_img:
            cam_origins = sample_camera_positions(
                k_cam, B, up_direction=config.up_direction,
                cam_r_start=config.cam_r_start, cam_r_end=config.cam_r_end,
            )
            cams = create_cam2world_matrix(cam_origins, config.up_direction)
        else:
            cams = batch["cam2world"]

        # generation is gradient-free (reference no_grad, utils.py:761-800)
        z, _ = encode(state.params_E, batch, k_enc, with_noise=True)
        gen_imgs, _ = render(state.params_G, z, cams, k_render, nerf_noise)
        gen_imgs = jax.lax.stop_gradient(gen_imgs)

        def d_loss_fn(params_D):
            r_logits = disc_logits(params_D, real_imgs, alpha, cond)
            f_logits = disc_logits(params_D, gen_imgs, alpha, cond)
            loss = gan_d_loss(r_logits, f_logits)
            if config.r1_lambda > 0:
                penalty = r1_penalty(
                    lambda p, i, a, cond: discriminator.apply(p, i, a, cond=cond),
                    params_D, real_imgs, alpha, cond,
                )
                loss = loss + config.r1_lambda * penalty
            return loss

        d_loss, grads = jax.value_and_grad(d_loss_fn)(state.params_D)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            d_loss = jax.lax.pmean(d_loss, axis_name)
        updates, opt_D = tx_D.update(grads, state.opt_D, state.params_D)
        params_D = optax.apply_updates(state.params_D, updates)
        return state.replace(params_D=params_D, opt_D=opt_D), d_loss

    # ------------------------------------------------------------------
    # G/E step (utils.py:621-741)
    # ------------------------------------------------------------------
    def generator_step(state, batch, key, alpha, nerf_noise):
        chunks = split_chunks(
            {k: v for k, v in batch.items() if not isinstance(v, list)}
        )

        def g_loss_fn(params_GE, chunk, key):
            params_G, params_E = params_GE
            k_enc, k_render = jax.random.split(key)
            z, z_reg = encode(params_E, chunk, k_enc, with_noise=True)
            gen_imgs, gen_depths = render(
                params_G, z, chunk["cam2world"], k_render, nerf_noise
            )
            if config.enable_discriminator:
                cond = chunk.get("cond") if config.cond_mode else None
                f_logits = disc_logits(state.params_D, gen_imgs, alpha, cond)
                loss_G = gan_g_loss(f_logits)
            else:
                loss_G = jnp.zeros(())
            photo = (
                photometric_loss(chunk["img"], gen_imgs)
                if config.photo_loss else jnp.zeros(())
            )
            dloss = (
                fg_depth_loss(chunk["depth"], gen_depths)
                if config.use_depth_loss else jnp.zeros(())
            )
            z_reg_loss = (
                z_reg * config.z_reg_weight if config.load_pcl else jnp.zeros(())
            )
            total = loss_G + photo + dloss * config.depth_loss_weight + z_reg_loss
            return total, {"g_loss": loss_G, "photo_loss": photo,
                           "depth_loss": dloss, "z_reg": z_reg}

        grad_fn = jax.grad(g_loss_fn, has_aux=True)
        params_GE = (state.params_G, state.params_E)
        zero_grads = jax.tree.map(jnp.zeros_like, params_GE)
        keys = jax.random.split(key, config.batch_split)

        def scan_body(carry, inp):
            grads_acc, metrics_acc = carry
            chunk, k = inp
            grads, metrics = grad_fn(params_GE, chunk, k)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
            return (grads_acc, metrics_acc), None

        init_metrics = {k: jnp.zeros(()) for k in
                        ("g_loss", "photo_loss", "depth_loss", "z_reg")}
        (grads, metrics), _ = jax.lax.scan(
            scan_body, (zero_grads, init_metrics), (chunks, keys)
        )
        # reference reports per-split means averaged over splits
        metrics = jax.tree.map(lambda m: m / config.batch_split, metrics)

        # grads now hold batch_split × full-batch-mean; rescale to the
        # configured effective gradient (see grad_accum_scale above)
        scale = (
            config.grad_accum_scale
            if config.grad_accum_scale is not None else config.batch_split
        )
        if scale != config.batch_split:
            grads = jax.tree.map(
                lambda g: g * (scale / config.batch_split), grads
            )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)

        grads_G, grads_E = grads
        upd_G, opt_G = tx_G.update(grads_G, state.opt_G, state.params_G)
        params_G = optax.apply_updates(state.params_G, upd_G)
        upd_E, opt_E = tx_E.update(grads_E, state.opt_E, state.params_E)
        params_E = optax.apply_updates(state.params_E, upd_E)
        return (
            state.replace(params_G=params_G, params_E=params_E,
                          opt_G=opt_G, opt_E=opt_E),
            metrics,
        )

    def train_step(state: TrainState, batch: dict, rng: jax.Array,
                   alpha, nerf_noise):
        """One full D-then-G iteration (train.py:101-105)."""
        batch = {k: v for k, v in batch.items() if k != "img_path"}
        if axis_name is not None:
            # decorrelate per-device sampling (cameras, encoder noise,
            # stratified ray perturbation) across the data axis
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        k_d, k_g = jax.random.split(jax.random.fold_in(rng, state.step))
        metrics = {}
        if config.enable_discriminator:
            state, d_loss = discriminator_step(state, batch, k_d, alpha, nerf_noise)
            metrics["d_loss"] = d_loss
        state, g_metrics = generator_step(state, batch, k_g, alpha, nerf_noise)
        metrics.update(g_metrics)
        state = state.replace(step=state.step + 1)
        return state, metrics

    return train_step


def make_chained_step(train_step):
    """Scan `steps_per_dispatch` train steps into ONE dispatched program.

    Semantically identical to calling `train_step` sequentially: the
    per-step rng is `fold_in(rng, state.step)` INSIDE the step and
    `state.step` advances through the scan carry, and alpha / nerf_noise
    arrive as per-step (k,) host-computed arrays (the same fp32 values the
    unchained loop passes). Exact-equality caveat: XLA fuses the scan body
    differently than the standalone step program, so results agree with the
    per-step loop only to float reassociation tolerance (measured: 1 ulp on
    the step-0 losses); the chained program ITSELF is deterministic, and a
    resumed run re-enters the same window pattern (windows restart at the
    checkpoint gates), so chained training keeps bit-exact resume.

    Why: the reference dispatches one step at a time (train.py:101-105);
    each dispatch costs a host↔device round trip, which dominates the small
    curriculum stages (stage 0 measures 0.21 s/step in-run vs 0.106 s/step
    for the identical math chained on-device). Chaining k steps amortizes
    that round trip k× while host-side batch loading overlaps the chain.

    chained(state, batches, rng, alphas, noises) -> (state, stacked_metrics)
    where every array in `batches` carries a leading (k,) axis (batch axis
    moves to axis 1) and metrics come back stacked (k,) per key.
    """

    def chained(state, batches, rng, alphas, noises):
        def body(st, xs):
            batch, alpha, noise = xs
            return train_step(st, batch, rng, alpha, noise)

        return jax.lax.scan(body, state, (batches, alphas, noises))

    return chained
