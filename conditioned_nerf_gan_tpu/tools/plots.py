"""Training-curve and metric plots.

Parity targets:
  * loss curves from checkpoint histories: reference misc/draw_loss.py —
    histories live in the `{step}.json` sidecar next to each checkpoint.
  * FID/oFID/LPIPS/PSNR curves from fid.txt: reference misc/plot_fid.py.
  * MRC volume slice plots: reference misc (mrc plotter).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def plot_losses(run_dir: str | Path, out_path: str | Path | None = None,
                smooth: int = 50) -> Path:
    """Plot every loss history stored in the newest checkpoint sidecar."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ..training.checkpoints import find_newest_checkpoint

    run_dir = Path(run_dir)
    newest = find_newest_checkpoint(run_dir / "checkpoints")
    if newest is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir}")
    histories = json.loads(newest.with_suffix(".json").read_text())

    fig, ax = plt.subplots(figsize=(10, 6))
    for name, values in histories.items():
        if not values or name == "fid_history":
            continue
        values = np.asarray(values, dtype=np.float64)
        if values.ndim == 2:  # [(step, value), ...]
            steps, ys = values[:, 0], values[:, 1]
        else:
            steps, ys = np.arange(len(values)), values
            if smooth > 1 and len(ys) > smooth:
                kernel = np.ones(smooth) / smooth
                ys = np.convolve(ys, kernel, mode="valid")
                steps = steps[: len(ys)]
        ax.plot(steps, ys, label=name)
    ax.set_xlabel("step")
    ax.set_ylabel("loss")
    ax.legend()
    ax.set_title(run_dir.name)
    out_path = Path(out_path or run_dir / "losses.png")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_fid(run_dir: str | Path, out_path: str | Path | None = None) -> Path:
    """Plot the metric log written by Trainer.evaluate (fid.txt lines:
    `step fid ofid lpips psnr`, reference utils.py:1009-1012)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    run_dir = Path(run_dir)
    rows = []
    for line in (run_dir / "fid.txt").read_text().split("\n"):
        if line.lstrip().startswith("#"):  # calibration stamp / comments
            continue
        parts = line.split()
        if len(parts) >= 5:
            rows.append([float(x) for x in parts[:5]])
    data = np.asarray(rows)
    names = ["FID", "oFID", "LPIPS", "PSNR"]
    fig, axes = plt.subplots(1, 4, figsize=(18, 4))
    for i, (axis, name) in enumerate(zip(axes, names)):
        axis.plot(data[:, 0], data[:, i + 1], marker="o")
        axis.set_title(name)
        axis.set_xlabel("step")
    out_path = Path(out_path or run_dir / "fid_curves.png")
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_mrc(mrc_path: str | Path, out_path: str | Path | None = None,
             threshold: float = 0.0) -> Path:
    """Plot orthogonal mid-slices + occupancy fraction of an MRC volume."""
    import struct

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    raw = Path(mrc_path).read_bytes()
    nx, ny, nz = struct.unpack_from("<3i", raw, 0)
    vol = np.frombuffer(raw[1024:], np.float32).reshape(nz, ny, nx)
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for axis_idx, axis in enumerate(axes):
        sl = [slice(None)] * 3
        sl[axis_idx] = vol.shape[axis_idx] // 2
        axis.imshow(vol[tuple(sl)], cmap="viridis")
        axis.set_title(f"axis {axis_idx} mid-slice")
    frac = float((vol > threshold).mean())
    fig.suptitle(f"{Path(mrc_path).name} — occupied>{threshold}: {frac:.3f}")
    out_path = Path(out_path or Path(mrc_path).with_suffix(".png"))
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Plot training curves/volumes")
    parser.add_argument("what", choices=["losses", "fid", "mrc"])
    parser.add_argument("path", help="run dir (losses/fid) or .mrc file")
    parser.add_argument("--out", default=None)
    args = parser.parse_args(argv)
    fn = {"losses": plot_losses, "fid": plot_fid, "mrc": plot_mrc}[args.what]
    print("Wrote", fn(args.path, args.out))


if __name__ == "__main__":
    main()
