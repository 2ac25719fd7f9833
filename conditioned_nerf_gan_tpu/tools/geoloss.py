"""Geometry-loss replay: evaluate the legacy geometry loss from a checkpoint.

Parity target: reference misc/geoloss_plot.py — sample positive points on the
GT surface and negative points away from it (KD-tree filtered), evaluate the
checkpoint's SIREN sigma at both sets, and report/plot the geometry loss
(training/losses.py:geometry_loss, reference utils.py:108-119).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..training.losses import geometry_loss
from .geometry import kdtree_negative_samples


def replay_geometry_loss(checkpoint: str | Path, car_index: int = 0,
                         n_points: int = 1024, radius: float = 0.05) -> float:
    from ..infer import Inferencer

    inferencer = Inferencer(checkpoint, load_dataset=True)
    sample = inferencer.valset[car_index]
    pcl = np.load(
        Path(sample["img_path"]).parent.parent / "pcl_color.npy"
    )
    rng = np.random.default_rng(0)
    pos = pcl[rng.permutation(len(pcl))[:n_points], :3]
    neg = kdtree_negative_samples(pcl, n_points, radius=radius)

    z = inferencer.encode(inferencer._cond_batch(sample))
    pts = jnp.asarray(np.concatenate([pos, neg]).astype(np.float32))[None]
    rgb_sigma = inferencer.generator.apply(
        inferencer.params_G, pts, z, method="eval_points"
    )
    sigma = rgb_sigma[..., -1]
    return float(geometry_loss(sigma, n_points))


def main(argv=None):
    parser = argparse.ArgumentParser(description="Replay the geometry loss")
    parser.add_argument("checkpoint")
    parser.add_argument("--car_index", type=int, default=0)
    parser.add_argument("--n_points", type=int, default=1024)
    args = parser.parse_args(argv)
    loss = replay_geometry_loss(args.checkpoint, args.car_index, args.n_points)
    print(f"geometry loss: {loss:.4f}")


if __name__ == "__main__":
    main()
