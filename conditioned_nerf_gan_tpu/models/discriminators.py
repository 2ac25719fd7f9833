"""Progressive-growing GAN discriminators (Flax, NHWC).

Parity targets:
  * CoordConv / AddCoords:          reference discriminators/discriminators.py:40-103
  * ResidualCoordConvBlock:         discriminators.py:106-135 (avg-pool downsample,
                                    residual /sqrt(2); convs keep torch-default init
                                    because the reference's kaiming applier only
                                    matches Linear there)
  * ProgressiveDiscriminator:       discriminators.py:138-199 (fromRGB adapters,
                                    fade-in blend at the second block, final 2×2 conv)
  * ProgressiveEncoderDiscriminator discriminators.py:202-271 (+256-d latent, 2-d pos)
  * …_inputCat:                     discriminators.py:274-335 (6-channel input)
  * …_projection:                   discriminators.py:338-408 (ResNet18 cmap projection)
  * Legacy strided pi-GAN variants: discriminators/sgdiscriminators.py:31-358
    (kaiming-normal init *does* apply to their convs, sgdiscriminators.py:25-28)

TPU-first: images are NHWC; nearest 0.5× downsampling is a stride-2 slice; the
fade-in is applied unconditionally (mathematically identical at alpha=1,
avoids data-dependent control flow under jit). The entry (fromRGB) layer is
selected statically from the input resolution, so each progressive-growing
stage is its own compiled function while all parameters are shared.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

IMG_SIZE_TO_LAYER = {2: 8, 4: 7, 8: 6, 16: 5, 32: 4, 64: 3, 128: 2, 256: 1, 512: 0}
SG_IMG_SIZE_TO_LAYER = {2: 7, 4: 6, 8: 5, 16: 4, 32: 3, 64: 2, 128: 1, 256: 0}


def _torch_conv2d_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: U(±1/sqrt(C_in·k²)); kernel (k, k, in, out)."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _kaiming_conv2d_init(key, shape, dtype=jnp.float32):
    """kaiming_normal(a=0.2, fan_in, leaky_relu) for conv kernels."""
    fan_in = shape[0] * shape[1] * shape[2]
    gain = math.sqrt(2.0 / (1.0 + 0.2 ** 2))
    return jax.random.normal(key, shape, dtype) * (gain / math.sqrt(fan_in))


class Conv2d(nn.Module):
    """NHWC conv with torch-compatible default init and fan_in bias.

    `dtype` enables the AMP policy (torch-autocast-like, matching the
    reference's fp16 amp.autocast D step at utils.py:803-829): operands and
    activations in bf16 (fp32 MXU accumulation internally), params fp32 —
    both forward and backward convs then run at the bf16 MXU rate.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    kaiming: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        c_in = x.shape[-1]
        init = _kaiming_conv2d_init if self.kaiming else _torch_conv2d_init
        kernel = self.param("kernel", init, (k, k, c_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        fan_in = c_in * k * k
        bound = 1.0 / math.sqrt(fan_in)
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (self.features,),
        )
        return y + bias.astype(y.dtype)


def add_coords(x: jax.Array) -> jax.Array:
    """Append normalized row/col coordinate channels (discriminators.py:40-84).

    In the reference's NCHW terms the first added channel varies along H and
    the second along W, both in [-1, 1].
    """
    B, H, W, _ = x.shape
    rows = jnp.linspace(-1.0, 1.0, H, dtype=x.dtype)
    cols = jnp.linspace(-1.0, 1.0, W, dtype=x.dtype)
    xx = jnp.broadcast_to(rows[None, :, None, None], (B, H, W, 1))
    yy = jnp.broadcast_to(cols[None, None, :, None], (B, H, W, 1))
    return jnp.concatenate([x, xx, yy], axis=-1)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        window_dimensions=(1, 2, 2, 1), window_strides=(1, 2, 2, 1),
        padding="VALID",
    ) / 4.0


def downsample_nearest_2x(x: jax.Array) -> jax.Array:
    """F.interpolate(scale_factor=0.5, mode='nearest') == stride-2 slice."""
    return x[:, ::2, ::2, :]


class AdapterBlock(nn.Module):
    """1×1 conv + LeakyReLU(0.2) fromRGB adapter (discriminators.py:21-29)."""

    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        return nn.leaky_relu(
            Conv2d(self.features, kernel_size=1, dtype=self.dtype,
                   name="conv")(x), 0.2
        )


class ResidualCoordConvBlock(nn.Module):
    """Two CoordConvs + optional avg-pool downsample + residual /sqrt(2)."""

    features: int
    downsample: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = nn.leaky_relu(
            Conv2d(self.features, 3, padding=1, dtype=self.dtype,
                   name="conv1")(add_coords(x)), 0.2
        )
        y = nn.leaky_relu(
            Conv2d(self.features, 3, padding=1, dtype=self.dtype,
                   name="conv2")(add_coords(y)), 0.2
        )
        identity = x
        if self.downsample:
            y = avg_pool_2x(y)
            identity = avg_pool_2x(identity)
        if identity.shape[-1] != self.features:
            identity = Conv2d(self.features, 1, dtype=self.dtype,
                              name="proj")(identity)
        return (y + identity.astype(y.dtype)) / math.sqrt(2.0)


class StridedResidualConvBlock(nn.Module):
    """Legacy strided block (sgdiscriminators.py:31-51); kaiming conv init."""

    features: int
    coord: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        h = add_coords(x) if self.coord else x
        y = nn.leaky_relu(
            Conv2d(self.features, 3, padding=1, kaiming=True, dtype=self.dtype,
                   name="conv1")(h), 0.2
        )
        if self.coord:
            y = add_coords(y)
        y = nn.leaky_relu(
            Conv2d(self.features, 3, stride=2, padding=1, kaiming=True,
                   dtype=self.dtype, name="conv2")(y), 0.2
        )
        identity = Conv2d(self.features, 1, stride=2, dtype=self.dtype,
                          name="proj")(x)
        return (y + identity.astype(y.dtype)) / math.sqrt(2.0)


_PROG_CHANNELS = (32, 64, 128, 256, 400, 400, 400, 400)
_ADAPTER_CHANNELS = (16, 32, 64, 128, 256, 400, 400, 400, 400)
_SG_CHANNELS = (64, 128, 256, 400, 400, 400, 400)
_SG_ADAPTERS = (32, 64, 128, 256, 400, 400, 400, 400)


class _ProgressiveBase(nn.Module):
    """Shared progressive-growing skeleton with fade-in (discriminators.py:184-199)."""

    final_features: int = 1
    input_channels: int = 3
    dtype: jnp.dtype | None = None

    def _trunk(self, img, alpha):
        start = IMG_SIZE_TO_LAYER[img.shape[1]]
        if self.dtype is not None:
            # keep the fade-in blend in the policy dtype (a traced fp32 alpha
            # would otherwise upcast every activation back to fp32)
            alpha = jnp.asarray(alpha, self.dtype)
        adapters = [
            AdapterBlock(c, dtype=self.dtype, name=f"fromRGB_{i}")
            for i, c in enumerate(_ADAPTER_CHANNELS)
        ]
        layers = [
            ResidualCoordConvBlock(c, downsample=True, dtype=self.dtype,
                                   name=f"layer_{i}")
            for i, c in enumerate(_PROG_CHANNELS)
        ]
        if self.is_initializing():
            # Materialize every resolution's parameters up front so the whole
            # progressive stack shares one param/optimizer tree across stages
            # (the reference builds all layers in __init__,
            # discriminators.py:145-170; unused layers get zero grads).
            c_in = img.shape[-1]
            for i, adapter in enumerate(adapters):
                adapter(jnp.zeros((1, 4, 4, c_in), img.dtype))
            for i, layer in enumerate(layers):
                layer(jnp.zeros((1, 4, 4, _ADAPTER_CHANNELS[i]), img.dtype))
        x = adapters[start](img)
        for i, layer in enumerate(layers[start:]):
            if i == 1:
                x = alpha * x + (1.0 - alpha) * adapters[start + 1](
                    downsample_nearest_2x(img)
                )
            x = layer(x)
        return x  # (B, 2, 2, 400)


class ProgressiveDiscriminator(_ProgressiveBase):
    """Scalar-logit progressive discriminator (discriminators.py:138-199)."""

    @nn.compact
    def __call__(self, img, alpha, cond=None, **kwargs):
        x = self._trunk(img, alpha)
        x = Conv2d(1, kernel_size=2, dtype=self.dtype, name="final_layer")(x)
        return x.reshape(x.shape[0], 1).astype(jnp.float32)


class ProgressiveEncoderDiscriminator(_ProgressiveBase):
    """Adds 256-d latent + 2-d position heads (discriminators.py:202-271)."""

    @nn.compact
    def __call__(self, img, alpha, cond=None, instance_noise: float = 0.0,
                 noise_key=None, **kwargs):
        if instance_noise > 0 and noise_key is not None:
            img = img + jax.random.normal(noise_key, img.shape, img.dtype) * instance_noise
        x = self._trunk(img, alpha)
        x = Conv2d(1 + 256 + 2, kernel_size=2, dtype=self.dtype,
                   name="final_layer")(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return x[..., 0:1], x[..., 1:257], x[..., 257:259]


class ProgressiveDiscriminatorInputCat(_ProgressiveBase):
    """Conditioning view concatenated on the channel axis (discriminators.py:274-335)."""

    input_channels: int = 6

    @nn.compact
    def __call__(self, img, alpha, cond=None, **kwargs):
        if cond is None:
            raise ValueError("inputCat discriminator requires a conditioning image")
        img = jnp.concatenate([img, cond], axis=-1)
        x = self._trunk(img, alpha)
        x = Conv2d(1, kernel_size=2, dtype=self.dtype, name="final_layer")(x)
        return x.reshape(x.shape[0], 1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# ResNet18 backbone for the projection discriminator
# ---------------------------------------------------------------------------

class _BatchNorm(nn.Module):
    """Stateless train-mode batch normalization.

    The reference's projection head uses torchvision BatchNorm2d in train mode
    throughout (pretrained=False, never switched to eval during the D step),
    so batch statistics are always live; running averages are intentionally
    omitted to keep the discriminator a pure function.
    """

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        # statistics in fp32 regardless of the AMP policy (autocast semantics)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(0, 1, 2))
        var = jnp.var(xf, axis=(0, 1, 2))
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
        return y.astype(x.dtype)


def _resnet_conv_init(key, shape, dtype=jnp.float32):
    """kaiming_normal(fan_out, relu) — torchvision resnet default."""
    fan_out = shape[0] * shape[1] * shape[3]
    return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)


class _ResNetConv(nn.Module):
    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        kernel = self.param(
            "kernel", _resnet_conv_init, (k, k, x.shape[-1], self.features)
        )
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class _BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = _ResNetConv(self.features, 3, self.stride, 1, dtype=self.dtype,
                          name="conv1")(x)
        out = nn.relu(_BatchNorm(name="bn1")(out))
        out = _ResNetConv(self.features, 3, 1, 1, dtype=self.dtype,
                          name="conv2")(out)
        out = _BatchNorm(name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = _ResNetConv(self.features, 1, self.stride, 0,
                                   dtype=self.dtype, name="downsample_conv")(x)
            identity = _BatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity.astype(out.dtype))


class ResNet18(nn.Module):
    """torchvision-architecture ResNet18 (NHWC) with a custom fc head."""

    num_outputs: int = 1600
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = _ResNetConv(64, 7, 2, 3, dtype=self.dtype, name="conv1")(x)
        x = nn.relu(_BatchNorm(name="bn1")(x))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        for stage, (features, stride) in enumerate(
            [(64, 1), (128, 2), (256, 2), (512, 2)]
        ):
            x = _BasicBlock(features, stride, dtype=self.dtype,
                            name=f"layer{stage + 1}_0")(x)
            x = _BasicBlock(features, 1, dtype=self.dtype,
                            name=f"layer{stage + 1}_1")(x)
        x = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        kernel = self.param(
            "fc_kernel",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / math.sqrt(shape[0]),
                1.0 / math.sqrt(shape[0]),
            ),
            (512, self.num_outputs),
        )
        bias = self.param(
            "fc_bias",
            lambda key, shape: jax.random.uniform(
                key, shape, jnp.float32, -1.0 / math.sqrt(512), 1.0 / math.sqrt(512)
            ),
            (self.num_outputs,),
        )
        return x @ kernel + bias


class ProgressiveDiscriminatorProjection(_ProgressiveBase):
    """Projection conditioning: logit = <trunk features, ResNet18(cond)>.

    Reference discriminators.py:338-408: trunk output flattened to 1600-d,
    cond mapped by ResNet18→1600, L2-normalized, inner product.
    """

    @nn.compact
    def __call__(self, img, alpha, cond=None, **kwargs):
        if cond is None:
            raise ValueError("projection discriminator requires a conditioning image")
        x = self._trunk(img, alpha)
        # flatten in the reference's NCHW order (discriminators.py:401):
        # the ResNet fc's 1600 outputs are dotted index-for-index against the
        # trunk features, so checkpoint/port parity needs the same ordering
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = x.astype(jnp.float32)  # (B, 1600)
        cmap = ResNet18(num_outputs=1600, dtype=self.dtype,
                        name="mapping")(cond)
        cmap = cmap / jnp.maximum(
            jnp.linalg.norm(cmap, axis=-1, keepdims=True), 1e-12
        )
        return jnp.sum(x * cmap, axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# Legacy strided pi-GAN discriminators (sgdiscriminators.py)
# ---------------------------------------------------------------------------

class _StridedBase(nn.Module):
    coord: bool = False
    final_features: int = 1
    dtype: jnp.dtype | None = None

    def _trunk(self, img, alpha):
        start = SG_IMG_SIZE_TO_LAYER[img.shape[1]]
        if self.dtype is not None:
            alpha = jnp.asarray(alpha, self.dtype)
        adapters = [
            AdapterBlock(c, dtype=self.dtype, name=f"fromRGB_{i}")
            for i, c in enumerate(_SG_ADAPTERS)
        ]
        layers = [
            StridedResidualConvBlock(c, coord=self.coord, dtype=self.dtype,
                                     name=f"layer_{i}")
            for i, c in enumerate(_SG_CHANNELS)
        ]
        if self.is_initializing():
            # materialize all stages' params (see _ProgressiveBase._trunk)
            c_in = img.shape[-1]
            for adapter in adapters:
                adapter(jnp.zeros((1, 4, 4, c_in), img.dtype))
            for i, layer in enumerate(layers):
                layer(jnp.zeros((1, 4, 4, _SG_ADAPTERS[i]), img.dtype))
        x = adapters[start](img)
        for i, layer in enumerate(layers[start:]):
            if i == 1:
                x = alpha * x + (1.0 - alpha) * adapters[start + 1](
                    downsample_nearest_2x(img)
                )
            x = layer(x)
        return x


class StridedDiscriminator(_StridedBase):
    """sgdiscriminators.py:53-101; returns (pred, None, None)."""

    @nn.compact
    def __call__(self, img, alpha, cond=None, **kwargs):
        x = self._trunk(img, alpha)
        x = Conv2d(1, kernel_size=2, dtype=self.dtype, name="final_layer")(x)
        return x.reshape(x.shape[0], 1).astype(jnp.float32), None, None


class CCSDiscriminator(_StridedBase):
    """sgdiscriminators.py:256-304 (CoordConv strided variant)."""

    coord: bool = True

    @nn.compact
    def __call__(self, img, alpha, cond=None, **kwargs):
        x = self._trunk(img, alpha)
        x = Conv2d(1, kernel_size=2, dtype=self.dtype, name="final_layer")(x)
        return x.reshape(x.shape[0], 1).astype(jnp.float32), None, None


class CCSEncoderDiscriminator(_StridedBase):
    """sgdiscriminators.py:308-358 (latent + position heads)."""

    coord: bool = True

    @nn.compact
    def __call__(self, img, alpha, cond=None, **kwargs):
        x = self._trunk(img, alpha)
        x = Conv2d(1 + 256 + 2, kernel_size=2, dtype=self.dtype,
                   name="final_layer")(x)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return x[..., 0:1], x[..., 1:257], x[..., 257:259]


DISCRIMINATOR_REGISTRY = {
    "ProgressiveDiscriminator": ProgressiveDiscriminator,
    "ProgressiveEncoderDiscriminator": ProgressiveEncoderDiscriminator,
    "ProgressiveDiscriminator_inputCat": ProgressiveDiscriminatorInputCat,
    "ProgressiveDiscriminator_projection": ProgressiveDiscriminatorProjection,
    "StridedDiscriminator": StridedDiscriminator,
    "CCSDiscriminator": CCSDiscriminator,
    "CCSEncoderDiscriminator": CCSEncoderDiscriminator,
}


def make_discriminator(name: str, **kwargs) -> nn.Module:
    """Build a discriminator by reference class name (utils.py:343)."""
    if name not in DISCRIMINATOR_REGISTRY:
        raise ValueError(f"Unknown discriminator {name!r}")
    return DISCRIMINATOR_REGISTRY[name](**kwargs)
