"""Dataset-inspection plots for the Blender rendering pipeline.

Parity target: reference blender_renderer/draw.py:1-86 — (a) the camera-origin
distribution of a rendered train/test set (checks the spherical sampling of
render_shapenet.py matches the training camera distribution) and (b) an image
grid of a rendered view folder. Headless: figures are written to files
instead of plt.show().
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def _cam_origins(cameras_npz: str | Path, n: int | None = None) -> np.ndarray:
    cams = np.load(cameras_npz)
    keys = sorted(
        (k for k in cams.files if k.startswith("world_mat_inv_")),
        key=lambda k: int(k.rsplit("_", 1)[1]),
    )
    if n is not None:
        keys = keys[:n]
    return np.stack([cams[k][:3, -1] for k in keys])


def show_train_test_cam_dist(
    train_cam_path: str | Path, test_cam_path: str | Path,
    trainset_size: int | None = None, testset_size: int | None = None,
    out_path: str | Path = "camera_distribution.png",
) -> Path:
    """3D scatter of train (blue) vs test (red) camera origins in world space."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    train = _cam_origins(train_cam_path, trainset_size)
    test = _cam_origins(test_cam_path, testset_size)
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(train[:, 0], train[:, 1], train[:, 2], c="tab:blue", label="train")
    ax.scatter(test[:, 0], test[:, 1], test[:, 2], c="tab:red", label="test")
    ax.legend()
    plt.title("Camera origin in world space")
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def show_img_in_grid(
    image_folder_dir: str | Path, nrows: int, ncols: int | None = None,
    out_path: str | Path | None = None,
) -> Path:
    """Tile every image in a folder into an nrows×ncols grid."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1 import ImageGrid

    folder = Path(image_folder_dir)
    paths = sorted(p for p in folder.iterdir() if p.suffix in (".png", ".jpg"))
    if ncols is None:
        ncols = -(-len(paths) // nrows)  # ceil div, reference draw.py:80-84
    fig = plt.figure(figsize=(4.0, 4.0))
    grid = ImageGrid(fig, 111, nrows_ncols=(nrows, ncols), axes_pad=0)
    for ax, p in zip(grid, paths):
        img = plt.imread(p)
        if img.dtype == np.uint16:
            img = (img / 65535.0).astype(np.float32)
        ax.imshow(img[..., :3])
        ax.set_xticks([])
        ax.set_yticks([])
    out_path = Path(out_path or folder.with_suffix(".grid.png"))
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("grid", help="tile a view folder into a grid image")
    g.add_argument("path")
    g.add_argument("--nrows", type=int, default=1)
    g.add_argument("-o", "--out", default=None)
    c = sub.add_parser("cams", help="plot train/test camera distributions")
    c.add_argument("train_cameras")
    c.add_argument("test_cameras")
    c.add_argument("-o", "--out", default="camera_distribution.png")
    opt = parser.parse_args(argv)

    if opt.cmd == "grid":
        out = show_img_in_grid(opt.path, opt.nrows, out_path=opt.out)
    else:
        out = show_train_test_cam_dist(
            opt.train_cameras, opt.test_cameras, out_path=opt.out
        )
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
