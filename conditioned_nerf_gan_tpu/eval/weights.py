"""Loading ported pretrained weights into the Flax metric nets.

The .npz files are flat {path: array} dicts keyed by the Flax param path
("params/Mixed_5b/branch1x1/kernel"), produced by tools/port_metric_weights.py
from the reference's pytorch_fid InceptionV3 / lpips AlexNet checkpoints
(reference metric_utils.py:4-37).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
import numpy as np


def flatten_params(params) -> dict:
    """Flax param tree → flat {"a/b/c": array}."""
    flat = {}

    def visit(path, leaf):
        flat["/".join(str(getattr(k, "key", k)) for k in path)] = leaf

    jax.tree_util.tree_map_with_path(visit, params)
    return flat


def load_flat_weights(params, flat: dict, *, name: str = "weights"):
    """Replace every leaf of `params` with its entry in `flat`.

    Strict: a leaf with no matching key, or a shape mismatch, is an error —
    a silently half-loaded metric net produces numbers that look plausible
    but are comparable to nothing.
    """
    expected = flatten_params(params)
    missing = sorted(set(expected) - set(flat))
    if missing:
        raise KeyError(f"{name}: missing {len(missing)} keys, e.g. {missing[:4]}")

    def replace(path, leaf):
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        arr = np.asarray(flat[key])
        if arr.shape != leaf.shape:
            raise ValueError(
                f"{name}: shape mismatch at {key}: got {arr.shape}, "
                f"expected {leaf.shape}"
            )
        return jnp.asarray(arr, leaf.dtype)

    return jax.tree_util.tree_map_with_path(replace, params)


def warn_random_init(env_var: str, what: str) -> None:
    warnings.warn(
        f"{what} is using fixed-seed RANDOM weights ({env_var} not set): "
        "metric values are self-consistent across this framework's runs but "
        "NOT comparable to published numbers. Port real weights with "
        "tools/port_metric_weights.py and export the env var.",
        stacklevel=3,
    )
