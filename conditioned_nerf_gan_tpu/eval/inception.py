"""InceptionV3 feature extractor for FID / oFID (Flax, NHWC).

Architecture parity with the FID-standard InceptionV3 used by the reference
through `pytorch_fid` (reference metric_utils.py:4,19-37 and
fid_evaluation.py:167-172): inputs are resized to 299², mapped from [0,1] to
[-1,1], and features are tapped at the standard FID blocks —
  * dim 768:  after Mixed_6e (17×17 map, used by oFID, metric_utils.py:16-37)
  * dim 2048: final global average pool (used by FID)

Weights: pretrained FID weights can be supplied as an .npz via the
CNG_INCEPTION_WEIGHTS env var (flat {path: array} in this module's param
naming). Without them the network uses a *fixed-seed random initialization*:
resulting FID/oFID values are self-consistent (comparable across checkpoints
of the same run and between this framework's runs) but NOT comparable to
published numbers. This is an explicit environment constraint (zero-egress
image, no pretrained caches), not a protocol deviation.
"""

from __future__ import annotations

import os
import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicConv2d(nn.Module):
    """conv (no bias) + frozen batch-norm (running stats) + relu."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    stride: int = 1
    padding: int | tuple = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        # variance-preserving random init: keeps random-weight features O(1)
        # through the ~20-conv stack so FID covariances stay well-conditioned
        kernel = self.param(
            "kernel",
            nn.initializers.he_normal(),
            (*self.kernel_size, x.shape[-1], self.features),
        )
        x = jax.lax.conv_general_dilated(
            x, kernel, (self.stride, self.stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        gamma = self.param("bn_scale", nn.initializers.ones, (self.features,))
        beta = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
        return nn.relu(x)


def _max_pool(x, window=3, stride=2, pad=0):
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), "VALID",
    )


def _avg_pool(x, window=3, stride=1, pad=1):
    vp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    summed = jax.lax.reduce_window(
        vp, 0.0, jax.lax.add, (1, window, window, 1),
        (1, stride, stride, 1), "VALID",
    )
    # count_include_pad=False semantics (torch default for inception pools):
    # per-pixel valid-tap counts are static — compute them host-side.
    h, w = x.shape[1], x.shape[2]
    ones = np.pad(np.ones((h, w), np.float32), pad)
    counts = np.lib.stride_tricks.sliding_window_view(ones, (window, window))[
        ::stride, ::stride
    ].sum(axis=(2, 3))
    return summed / counts[None, :, :, None]


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(
            _avg_pool(x)
        )
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # pytorch_fid's final block uses max pool in E_2

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            bp = _max_pool(x, window=3, stride=1, pad=1)
        else:
            bp = _avg_pool(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Returns (features_768 (B,17,17,768), features_2048 (B,2048))."""

    @nn.compact
    def __call__(self, x):
        """x: (B, H, W, 3) in [0, 1]; resized to 299² and normalized inside."""
        x = jax.image.resize(x, (x.shape[0], 299, 299, 3), method="bilinear")
        x = x * 2.0 - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        feat_768 = x  # (B, 17, 17, 768)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        feat_2048 = jnp.mean(x, axis=(1, 2))
        return feat_768, feat_2048


_cached = {}


def get_inception(seed: int = 0):
    """(module, params) with weights from CNG_INCEPTION_WEIGHTS or fixed seed."""
    if "model" in _cached:
        return _cached["model"]
    model = InceptionV3Features()
    dummy = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), dummy)

    weights_path = os.environ.get("CNG_INCEPTION_WEIGHTS")
    if weights_path and os.path.exists(weights_path):
        from .weights import load_flat_weights

        params = load_flat_weights(
            params, dict(np.load(weights_path)), name="CNG_INCEPTION_WEIGHTS"
        )
    else:
        from .weights import warn_random_init

        warn_random_init("CNG_INCEPTION_WEIGHTS", "InceptionV3 (FID/oFID)")
    _cached["model"] = (model, params)
    return model, params
