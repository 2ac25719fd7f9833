"""Latent-space diagnostics: t-SNE, nearest-latent search.

Parity targets: reference misc/tsne.py (t-SNE of encoded latents over a
dataset) and misc/find_closest_z.py (nearest encoded neighbor of a query).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def encode_dataset_latents(checkpoint: str | Path, sampling_mode: str = "val",
                           max_items: int = 200):
    """Encode every dataset item to its global latent; returns (Z, labels)."""
    from ..infer import Inferencer

    inferencer = Inferencer(checkpoint, sampling_mode=sampling_mode,
                            load_dataset=True)
    ds = inferencer.valset
    zs, labels = [], []
    for i in range(min(len(ds), max_items)):
        sample = ds[i]
        z = inferencer.encode(inferencer._cond_batch(sample))
        if isinstance(z, tuple):
            z = z[1]  # global feature of (volume, global) encoders
        zs.append(np.asarray(z[0]))
        labels.append(Path(sample["img_path"]).parent.parent.stem)
    return np.stack(zs), labels


def tsne_plot(checkpoint: str | Path, out_path: str | Path,
              sampling_mode: str = "val", max_items: int = 200,
              perplexity: float = 15.0) -> Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    zs, labels = encode_dataset_latents(checkpoint, sampling_mode, max_items)
    perplexity = min(perplexity, max(2.0, len(zs) / 4))
    emb = TSNE(n_components=2, perplexity=perplexity, init="pca",
               random_state=0).fit_transform(zs)
    uniq = sorted(set(labels))
    color_idx = {c: i for i, c in enumerate(uniq)}
    colors = [color_idx[l] for l in labels]
    fig, ax = plt.subplots(figsize=(8, 8))
    sc = ax.scatter(emb[:, 0], emb[:, 1], c=colors, cmap="tab20", s=12)
    ax.set_title(f"t-SNE of {len(zs)} encoded latents ({len(uniq)} objects)")
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def find_closest_z(checkpoint: str | Path, query_index: int = 0,
                   sampling_mode: str = "val", max_items: int = 200):
    """Nearest encoded neighbors of one dataset item (misc/find_closest_z.py)."""
    zs, labels = encode_dataset_latents(checkpoint, sampling_mode, max_items)
    q = zs[query_index]
    dists = np.linalg.norm(zs - q, axis=1)
    order = np.argsort(dists)
    return [(labels[i], float(dists[i])) for i in order[:10]]


def main(argv=None):
    parser = argparse.ArgumentParser(description="Latent diagnostics")
    sub = parser.add_subparsers(dest="cmd", required=True)
    t = sub.add_parser("tsne")
    t.add_argument("checkpoint"), t.add_argument("--out", default="tsne.png")
    t.add_argument("--max_items", type=int, default=200)
    f = sub.add_parser("closest")
    f.add_argument("checkpoint"), f.add_argument("--index", type=int, default=0)
    args = parser.parse_args(argv)
    if args.cmd == "tsne":
        print("Wrote", tsne_plot(args.checkpoint, args.out,
                                 max_items=args.max_items))
    else:
        for name, d in find_closest_z(args.checkpoint, args.index):
            print(f"{name}  {d:.4f}")


if __name__ == "__main__":
    main()
