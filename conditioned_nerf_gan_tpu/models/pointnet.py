"""ResNet-PointNet encoder: colored point cloud -> global latent code.

Parity target: reference generators/pointnet.py:10-141 (`ResnetBlockFC`,
`ResnetPointnet`) and :164-180 (`encode_pcl` latent normalization + noise
blend). Structure follows Occupancy Networks' PointNet; inits replicate torch
defaults (fc_1 weight zero-initialized, shortcut bias-free).

TPU notes: the whole encoder is (B, T, F) batched matmuls + a max-reduce over
the point axis — MXU + VPU friendly with no gather/scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import TorchLinear


class ResnetBlockFC(nn.Module):
    """x + fc_1(relu(fc_0(relu(x)))), with a bias-free shortcut on dim change."""

    size_out: int
    size_h: int | None = None
    dtype: jnp.dtype | None = None  # AMP policy: bf16 matmuls AND activations

    @nn.compact
    def __call__(self, x, pooled=None):
        """pooled: optional (B, 1, F) point-invariant context. Equivalent to
        calling on `concat([x, broadcast(pooled)], -1)` (same params), but
        the pooled contribution costs one per-batch matmul instead of
        doubling every per-point matmul's fan_in (exact: relu and matmul
        both distribute over the concat split)."""
        size_in = x.shape[-1] + (pooled.shape[-1] if pooled is not None else 0)
        size_h = self.size_h or min(size_in, self.size_out)
        amp = dict(dtype=self.dtype, fp32_out=False)

        relu_pooled = nn.relu(pooled) if pooled is not None else None
        net = TorchLinear(size_h, name="fc_0", **amp)(
            nn.relu(x), extra=relu_pooled
        )
        dx = TorchLinear(
            self.size_out, kernel_init=nn.initializers.zeros, name="fc_1", **amp
        )(nn.relu(net))
        if size_in == self.size_out:
            x_s = x
        else:
            x_s = TorchLinear(self.size_out, use_bias=False, name="shortcut",
                              **amp)(x, extra=pooled)
        return x_s.astype(dx.dtype) + dx


class ResnetPointnet(nn.Module):
    """(B, T, dim) points -> (B, c_dim) latent via 5 ResNet blocks + max-pool.

    `dtype=bfloat16` enables the torch-autocast-like mixed policy (the
    reference trains this encoder under fp16 AMP, utils.py:644-654): all
    matmuls and the relu chain run bf16 on the MXU, params/grads and the
    final latent stay fp32.
    """

    c_dim: int = 512
    hidden_dim: int = 512
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, p):
        h = self.hidden_dim
        amp = dict(dtype=self.dtype, fp32_out=False)
        net = TorchLinear(2 * h, name="fc_pos", **amp)(p)
        net = ResnetBlockFC(h, name="block_0", dtype=self.dtype)(net)
        for i in range(1, 5):
            pooled = jnp.max(net, axis=1, keepdims=True)
            net = ResnetBlockFC(h, name=f"block_{i}", dtype=self.dtype)(
                net, pooled=pooled
            )
        net = jnp.max(net, axis=1)
        # final latent in fp32: encode_pcl's whitening (mean/std, ddof=1)
        # needs fp32 resolution
        return TorchLinear(self.c_dim, name="fc_c", dtype=self.dtype)(
            nn.relu(net)
        ).astype(jnp.float32)


def encode_pcl(
    apply_fn,
    params,
    pcl: jax.Array,
    *,
    noise_weight: float = 0.0,
    key: jax.Array | None = None,
    noise: jax.Array | None = None,
):
    """Encode a point cloud and normalize/noise the latent.

    Matches reference pointnet.py:164-180: l_reg = mean latent L2 norm;
    latent is feature-whitened (mean/std over the channel axis, torch's
    unbiased std) then blended with gaussian noise by `noise_weight`.
    Returns (z, l_reg).
    """
    encodes = apply_fn(params, pcl)
    l_reg = jnp.mean(jnp.linalg.norm(encodes, axis=1))
    encodes = encodes - jnp.mean(encodes, axis=1, keepdims=True)
    encodes = encodes / jnp.std(encodes, axis=1, keepdims=True, ddof=1)
    if noise_weight:
        if noise is None:
            if key is None:
                raise ValueError("encode_pcl with noise_weight needs a key")
            noise = jax.random.normal(key, encodes.shape, dtype=encodes.dtype)
        z = noise_weight * noise + (1.0 - noise_weight) * encodes
    else:
        z = encodes
    return z, l_reg
