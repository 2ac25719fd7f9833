"""3D U-Net voxel encoder family (Flax, NDHWC).

Parity targets: reference generators/unet3d.py —
  * layer-order DSL ('gcr' = GroupNorm→Conv→ReLU, bias dropped when a norm is
    present): unet3d.py:21-98
  * SingleConv/DoubleConv/ExtResNetBlock: unet3d.py:101-265
  * Encoder (MaxPool3d(2) + block): unet3d.py:268-323
  * Decoder (nearest-upsample+concat for DoubleConv, transposed-conv+sum for
    ExtResNetBlock): unet3d.py:326-451
  * Abstract3DUNet / Abstract3DPyramidUNet with `return_global` bottleneck
    avg-pool: unet3d.py:488-791
  * UNet3D / PyramidUNet3D / ResidualUNet3D: unet3d.py:793-898

TPU-first: volumes are channel-last (B, D, H, W, C); convs use
`lax.conv_general_dilated` with NDHWC dimension numbers (native TPU conv
layout), max-pool is a reduce_window, nearest 2× upsampling is a repeat, and
the transposed conv is an lhs-dilated conv (identical math to
ConvTranspose3d(k=3, stride=2, padding=1, output_padding=1)).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def number_of_features_per_level(init_channels: int, num_levels: int) -> list[int]:
    return [init_channels * 2 ** k for k in range(num_levels)]


def _torch_conv_init(key, shape, dtype=jnp.float32):
    """torch Conv3d default kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    flax kernel shape (k, k, k, C_in, C_out); fan_in = C_in * k³.
    """
    receptive = shape[0] * shape[1] * shape[2]
    fan_in = receptive * shape[3]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Conv3d(nn.Module):
    """3-D convolution, NDHWC, torch-default init.

    `dtype` enables the torch-autocast-like AMP policy (the reference trains
    the encoder under fp16 amp.autocast, utils.py:644-654): bf16 operands and
    activations, fp32 params/grads; GroupNorm stays fp32 via flax's dtype
    promotion against the fp32 scale/bias params.
    """

    features: int
    kernel_size: int = 3
    padding: int = 1
    use_bias: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        c_in = x.shape[-1]
        kernel = self.param("kernel", _torch_conv_init, (k, k, k, c_in, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        pad = [(self.padding, self.padding)] * 3
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1, 1), padding=pad,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        if self.use_bias:
            fan_in = c_in * k ** 3
            bound = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.features,),
            )
            y = y + bias.astype(y.dtype)
        return y


class ConvTranspose3d(nn.Module):
    """Transposed conv matching torch ConvTranspose3d(k, stride=2, padding=1,
    output_padding=1): exact 2× spatial upsampling.

    Implemented as an lhs-dilated conv with spatially-flipped kernel — the
    gradient-of-conv formulation XLA maps directly onto the MXU.
    """

    features: int
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        c_in = x.shape[-1]

        def init(key, shape, dtype=jnp.float32):
            # torch ConvTranspose3d default: U(±1/sqrt(C_in * k³)) with weight
            # shape (C_in, C_out, k, k, k) → fan_in = C_out? torch uses
            # weight.size(1)*k³ = C_out*k³ for transposed convs.
            fan_in = self.features * k ** 3
            bound = 1.0 / math.sqrt(fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        kernel = self.param("kernel", init, (k, k, k, c_in, self.features))
        fan_in = self.features * k ** 3
        bound = 1.0 / math.sqrt(fan_in)
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (self.features,),
        )
        # stride-2 transposed conv with padding=1, output_padding=1:
        # dilate input by 2, pad (k-1-p, k-1-p+op) = (1, 2), flipped kernel.
        flipped = kernel[::-1, ::-1, ::-1, :, :]
        if self.dtype is not None:
            x = x.astype(self.dtype)
            flipped = flipped.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x, flipped, window_strides=(1, 1, 1), padding=[(1, 2)] * 3,
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return y + bias.astype(y.dtype)


class SingleConv(nn.Module):
    """One conv layer with norm/non-linearity per the order DSL ('gcr', ...)."""

    features: int
    order: str = "gcr"
    num_groups: int = 8
    kernel_size: int = 3
    padding: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        order = self.order
        has_norm = "g" in order or "b" in order
        for i, char in enumerate(order):
            if char == "r":
                x = nn.relu(x)
            elif char == "l":
                x = nn.leaky_relu(x, negative_slope=0.1)
            elif char == "e":
                x = nn.elu(x)
            elif char == "c":
                x = Conv3d(
                    self.features, self.kernel_size, self.padding,
                    use_bias=not has_norm, dtype=self.dtype, name="conv",
                )(x)
            elif char == "g":
                channels = x.shape[-1]
                groups = self.num_groups if channels >= self.num_groups else 1
                x = nn.GroupNorm(num_groups=groups, epsilon=1e-5, name="groupnorm")(x)
            elif char == "b":
                # BatchNorm without running stats tracking (inference-style
                # batch statistics); the reference default configs never use it.
                x = nn.GroupNorm(num_groups=x.shape[-1], epsilon=1e-5,
                                 name="batchnorm")(x)
            else:
                raise ValueError(f"Unsupported layer char {char!r}")
        return x


class DoubleConv(nn.Module):
    """Two SingleConvs; encoder halves channels mid-block (unet3d.py:135-192)."""

    features: int
    encoder: bool
    order: str = "gcr"
    num_groups: int = 8
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        if self.encoder:
            mid = max(self.features // 2, x.shape[-1])
        else:
            mid = self.features
        x = SingleConv(mid, self.order, self.num_groups, self.kernel_size,
                       dtype=self.dtype, name="SingleConv1")(x)
        x = SingleConv(self.features, self.order, self.num_groups,
                       self.kernel_size, dtype=self.dtype, name="SingleConv2")(x)
        return x


class ExtResNetBlock(nn.Module):
    """SingleConv + residual pair with post-residual activation (unet3d.py:195-265)."""

    features: int
    order: str = "cge"
    num_groups: int = 8
    kernel_size: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out = SingleConv(self.features, self.order, self.num_groups,
                         self.kernel_size, dtype=self.dtype, name="conv1")(x)
        residual = out
        out = SingleConv(self.features, self.order, self.num_groups,
                         self.kernel_size, dtype=self.dtype, name="conv2")(out)
        n_order = "".join(c for c in self.order if c not in "rel")
        out = SingleConv(self.features, n_order, self.num_groups,
                         self.kernel_size, dtype=self.dtype, name="conv3")(out)
        out = out + residual.astype(out.dtype)
        if "l" in self.order:
            return nn.leaky_relu(out, negative_slope=0.1)
        if "e" in self.order:
            return nn.elu(out)
        return nn.relu(out)


def max_pool_3d(x: jax.Array, window: int = 2) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, window, window, window, 1),
        window_strides=(1, window, window, window, 1),
        padding="VALID",
    )


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


class AbstractUNet3D(nn.Module):
    """Shared encoder/decoder skeleton; `pyramid` returns all decoder levels."""

    in_channels: int
    out_channels: int
    f_maps: int | Sequence[int] = 64
    layer_order: str = "gcr"
    num_groups: int = 8
    num_levels: int = 4
    residual: bool = False
    pyramid: bool = False
    return_global: bool = False
    is_segmentation: bool = False
    final_sigmoid: bool = False
    testing: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        f_maps = self.f_maps
        if isinstance(f_maps, int):
            f_maps = number_of_features_per_level(f_maps, self.num_levels)

        def block(features, encoder, name):
            if self.residual:
                # the reference passes its layer_order ("gcr") through to
                # ExtResNetBlock, overriding that class's "cge" default
                # (unet3d.py:310-317 forwards order=layer_order)
                return ExtResNetBlock(features, order=self.layer_order,
                                      num_groups=self.num_groups,
                                      dtype=self.dtype, name=name)
            return DoubleConv(features, encoder, self.layer_order,
                              self.num_groups, dtype=self.dtype, name=name)

        # ---- encoder path ------------------------------------------------
        skips = []
        for i, features in enumerate(f_maps):
            if i > 0:
                x = max_pool_3d(x)
            x = block(features, True, f"encoder_{i}")(x)
            skips.insert(0, x)

        if self.return_global:
            # bottleneck avg-pool; reduce + expose in fp32 under the AMP policy
            global_features = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3))
        skips = skips[1:]

        # ---- decoder path ------------------------------------------------
        feature_pyramid = []
        for i, enc in enumerate(skips):
            if self.residual:
                x = ConvTranspose3d(enc.shape[-1], dtype=self.dtype,
                                    name=f"upconv_{i}")(x)
                x = enc.astype(x.dtype) + x
            else:
                x = upsample_nearest_2x(x)
                x = jnp.concatenate([enc.astype(x.dtype), x], axis=-1)
            x = block(enc.shape[-1], False, f"decoder_{i}")(x)
            feature_pyramid.append(x.astype(jnp.float32))

        if self.pyramid:
            if self.return_global:
                return feature_pyramid, global_features
            return feature_pyramid

        # the feature volume feeds the fp32 trilinear-gather/SIREN path
        x = Conv3d(self.out_channels, kernel_size=1, padding=0,
                   name="final_conv")(x.astype(jnp.float32))
        if self.is_segmentation and self.testing:
            x = nn.sigmoid(x) if self.final_sigmoid else nn.softmax(x, axis=-1)
        if self.return_global:
            return x, global_features
        return x


def UNet3D(**kwargs) -> AbstractUNet3D:
    """Standard 3D U-Net (DoubleConv + nearest upsampling), unet3d.py:793-827."""
    return _make(residual=False, pyramid=False, **kwargs)


def PyramidUNet3D(**kwargs) -> AbstractUNet3D:
    """U-Net returning the decoder feature pyramid, unet3d.py:829-863."""
    return _make(residual=False, pyramid=True, **kwargs)


def ResidualUNet3D(**kwargs) -> AbstractUNet3D:
    """Residual U-Net (ExtResNetBlock + transposed conv + sum), unet3d.py:865-898."""
    kwargs.setdefault("num_levels", 5)
    return _make(residual=True, pyramid=False, **kwargs)


def _make(*, in_channels, out_channels, f_maps=64, layer_order="gcr",
          num_groups=8, num_levels=4, is_segmentation=False,
          final_sigmoid=False, return_global=False, testing=False,
          residual=False, pyramid=False, dtype=None, **_unused) -> AbstractUNet3D:
    return AbstractUNet3D(
        in_channels=in_channels, out_channels=out_channels, f_maps=f_maps,
        layer_order=layer_order, num_groups=num_groups, num_levels=num_levels,
        residual=residual, pyramid=pyramid, return_global=return_global,
        is_segmentation=is_segmentation, final_sigmoid=final_sigmoid,
        testing=testing, dtype=dtype,
    )


_UNETS = {"UNet3D": UNet3D, "PyramidUNet3D": PyramidUNet3D,
          "ResidualUNet3D": ResidualUNet3D}


def make_unet(type: str = "UNet3D", **kwargs) -> AbstractUNet3D:
    """Build a U-Net by reference class name (`metadata['unet']['type']`)."""
    if type not in _UNETS:
        raise ValueError(f"Unknown unet type {type!r}")
    return _UNETS[type](**kwargs)
