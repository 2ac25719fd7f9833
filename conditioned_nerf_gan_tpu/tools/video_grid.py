"""Compose multiple videos into one grid video (reference misc/video_grid.py)."""

from __future__ import annotations

import argparse
import math
from pathlib import Path

import numpy as np


def video_grid(video_paths: list[str | Path], out_path: str | Path,
               ncols: int | None = None, fps: int | None = None) -> Path:
    import cv2

    caps = [cv2.VideoCapture(str(p)) for p in video_paths]
    n = len(caps)
    ncols = ncols or math.ceil(math.sqrt(n))
    nrows = math.ceil(n / ncols)
    w = int(caps[0].get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(caps[0].get(cv2.CAP_PROP_FRAME_HEIGHT))
    fps = fps or int(caps[0].get(cv2.CAP_PROP_FPS)) or 24
    n_frames = min(int(c.get(cv2.CAP_PROP_FRAME_COUNT)) for c in caps)

    out_path = Path(out_path)
    video = cv2.VideoWriter(
        str(out_path), cv2.VideoWriter_fourcc(*"mp4v"), fps,
        (ncols * w, nrows * h),
    )
    for _ in range(n_frames):
        grid = np.zeros((nrows * h, ncols * w, 3), np.uint8)
        for idx, cap in enumerate(caps):
            ok, frame = cap.read()
            if not ok:
                continue
            if frame.shape[:2] != (h, w):
                frame = cv2.resize(frame, (w, h))
            r, c = divmod(idx, ncols)
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = frame
        video.write(grid)
    video.release()
    for cap in caps:
        cap.release()
    return out_path


def main(argv=None):
    parser = argparse.ArgumentParser(description="Compose videos into a grid")
    parser.add_argument("videos", nargs="+")
    parser.add_argument("--out", required=True)
    parser.add_argument("--ncols", type=int, default=None)
    args = parser.parse_args(argv)
    print("Wrote", video_grid(args.videos, args.out, args.ncols))


if __name__ == "__main__":
    main()
