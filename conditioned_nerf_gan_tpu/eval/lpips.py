"""LPIPS perceptual distance (AlexNet backbone, Flax).

Parity target: the reference's `lpips.LPIPS(net="alex", spatial=False)`
(reference metric_utils.py:259-267,290): inputs in [-1,1], per-layer
unit-normalized AlexNet features, squared differences reduced by 1×1 linear
heads, spatially averaged, summed over layers.

Weights are loadable from an .npz via CNG_LPIPS_WEIGHTS; otherwise a fixed-
seed random init gives a self-consistent (but not literature-comparable)
perceptual distance — same environment caveat as eval/inception.py.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# AlexNet feature config: (features, kernel, stride, padding), maxpool after
# layers 0, 1 (and before 2), per torchvision alexnet.features
_ALEX_LAYERS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class _AlexFeatures(nn.Module):
    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (c, k, s, p) in enumerate(_ALEX_LAYERS):
            kernel = self.param(
                f"conv{i}_kernel", nn.initializers.he_normal(), (k, k, x.shape[-1], c)
            )
            bias = self.param(f"conv{i}_bias", nn.initializers.zeros, (c,))
            x = jax.lax.conv_general_dilated(
                x, kernel, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bias
            x = nn.relu(x)
            feats.append(x)
            if i in (0, 1):
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                )
        return feats


class LPIPS(nn.Module):
    """lpips(a, b) for images in [-1, 1], NHWC."""

    @nn.compact
    def __call__(self, a, b):
        norm_a = (a - _SHIFT) / _SCALE
        norm_b = (b - _SHIFT) / _SCALE
        net = _AlexFeatures(name="alex")
        fa = net(norm_a)
        fb = net(norm_b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            # lpips.normalize_tensor: x / (||x||₂ + 1e-10), channel-wise
            xa = xa / (jnp.linalg.norm(xa, axis=-1, keepdims=True) + 1e-10)
            xb = xb / (jnp.linalg.norm(xb, axis=-1, keepdims=True) + 1e-10)
            diff = (xa - xb) ** 2
            w = self.param(
                f"lin{i}",
                lambda key, shape: jnp.abs(jax.random.normal(key, shape)) * 0.1,
                (diff.shape[-1],),
            )
            total = total + jnp.mean(jnp.sum(diff * w, axis=-1), axis=(1, 2))
        return total  # (B,)


_cached = {}


def get_lpips(seed: int = 0):
    if "model" in _cached:
        return _cached["model"]
    model = LPIPS()
    dummy = jnp.zeros((1, 64, 64, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(seed), dummy, dummy)
    weights_path = os.environ.get("CNG_LPIPS_WEIGHTS")
    if weights_path and os.path.exists(weights_path):
        from .weights import load_flat_weights

        params = load_flat_weights(
            params, dict(np.load(weights_path)), name="CNG_LPIPS_WEIGHTS"
        )
    else:
        from .weights import warn_random_init

        warn_random_init("CNG_LPIPS_WEIGHTS", "LPIPS (AlexNet)")
    _cached["model"] = (model, params)
    return model, params
