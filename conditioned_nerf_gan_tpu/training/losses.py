"""Loss functions.

Parity targets:
  * non-saturating softplus GAN losses: reference utils.py:673 (G) and
    utils.py:829-833 (D)
  * R1 gradient penalty (double backward): utils.py:807-821 — in JAX this is
    a `jax.grad` of the discriminator w.r.t. real images inside the D loss,
    differentiated again by the outer parameter grad; no GradScaler
    gymnastics are needed because training runs bf16/fp32 without loss
    scaling.
  * photometric MSE: utils.py:102-105
  * foreground-masked depth MSE: utils.py:96-99
  * legacy geometry loss: utils.py:108-119
  * latent-norm regularizer: generators/pointnet.py:174 (weighted at
    utils.py:695)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def z_sampler(key: jax.Array, shape, dist: str = "gaussian") -> jax.Array:
    """Latent sampler for unconditional runs (reference utils.py:53-58)."""
    if dist == "gaussian":
        return jax.random.normal(key, shape)
    if dist == "uniform":
        return jax.random.uniform(key, shape) * 2.0 - 1.0
    raise ValueError(f"Unknown z_dist {dist!r}")


def gan_g_loss(fake_logits: jax.Array) -> jax.Array:
    """Non-saturating generator loss: softplus(-D(G(z)))."""
    return jax.nn.softplus(-fake_logits).mean()


def gan_d_loss(real_logits: jax.Array, fake_logits: jax.Array) -> jax.Array:
    """Discriminator loss: softplus(D(fake)) + softplus(-D(real))."""
    return jax.nn.softplus(fake_logits).mean() + jax.nn.softplus(-real_logits).mean()


def r1_penalty(disc_apply, params, real_imgs: jax.Array, alpha, cond=None) -> jax.Array:
    """0.5 * E[‖∇_x D(x)‖²] on real images (utils.py:807-821, sans λ).

    Differentiable w.r.t. `params` (double backward), matching the
    reference's create_graph=True autograd.grad.
    """

    def score_sum(imgs):
        out = disc_apply(params, imgs, alpha, cond=cond)
        logits = out[0] if isinstance(out, tuple) else out
        return logits.sum()

    grad_real = jax.grad(score_sum)(real_imgs)
    sq_norms = jnp.sum(grad_real.reshape(grad_real.shape[0], -1) ** 2, axis=1)
    return 0.5 * sq_norms.mean()


def photometric_loss(real: jax.Array, generated: jax.Array) -> jax.Array:
    return jnp.mean((real - generated) ** 2)


def depth_loss(gt_depth: jax.Array, pred_depth: jax.Array) -> jax.Array:
    """MSE over ground-truth foreground (nonzero-depth) pixels only."""
    mask = gt_depth != 0
    sq = (gt_depth - pred_depth) ** 2
    return jnp.sum(jnp.where(mask, sq, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def geometry_loss(sigma_preds: jax.Array, num_pos_points: int) -> jax.Array:
    """Penalize low sigma at positive points, high sigma at negatives."""
    pos = jax.nn.softplus(-sigma_preds[:, :num_pos_points]).mean()
    neg = jax.nn.softplus(sigma_preds[:, num_pos_points:]).mean()
    return pos + neg
