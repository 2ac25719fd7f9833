"""Build per-car colored point clouds (pcl_color.npy) by depth backprojection.

Parity target: reference misc/write_pcl_color.py:1-58 — for every car listed
in the dataset's .lst splits that is missing pcl_color.npy, backproject all
rendered views' GT depth+rgb into world space, concatenate, subsample to
pcl_size points, and save (N, 6) [xyz | rgb] float32. This is the offline
producer of the PointNet conditioning input (data/shapenet.py pcl path).
"""

from __future__ import annotations

import argparse
import random
from pathlib import Path

import numpy as np

from .blender.project import backproject_points


def build_pcl_color(
    car_dir: str | Path, num_views: int = 24, pcl_size: int = 100_000,
    img_size: int = 256, seed: int = 0, overwrite: bool = False,
) -> Path | None:
    """Write {car_dir}/pcl_color.npy; returns the path (None if skipped)."""
    car_dir = Path(car_dir)
    out = car_dir / "pcl_color.npy"
    if out.exists() and out.stat().st_size > 0 and not overwrite:
        return None
    points = np.concatenate(
        [np.concatenate(backproject_points(car_dir, v, img_size), axis=1)
         for v in range(num_views)], axis=0,
    )
    if points.shape[0] >= pcl_size:
        idx = random.Random(seed).sample(range(points.shape[0]), pcl_size)
        points = points[idx]
    else:
        print(f"total points less than {pcl_size}: {car_dir}")
    np.save(out, points.astype(np.float32))
    return out


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("dataset_root",
                        help="e.g. .../ShapeNetCar (its parent holds the .lst splits)")
    parser.add_argument("--lists", nargs="*",
                        default=["thousand", "val", "twenty"])
    parser.add_argument("-v", "--num_views", type=int, default=24)
    parser.add_argument("-n", "--pcl_size", type=int, default=100_000)
    parser.add_argument("-s", "--img_size", type=int, default=256)
    parser.add_argument("--overwrite", action="store_true")
    opt = parser.parse_args(argv)

    root = Path(opt.dataset_root)
    cars: list[str] = []
    for name in opt.lists:
        lst = root.parent / f"{name}.lst"
        if lst.exists():
            cars += [line for line in lst.read_text().splitlines() if line]
    seen = set()
    cars = [c for c in cars if not (c in seen or seen.add(c))]

    errors = []
    for car in cars:
        car_dir = root / car
        if not car_dir.is_dir():
            continue
        try:
            written = build_pcl_color(
                car_dir, opt.num_views, opt.pcl_size, opt.img_size,
                overwrite=opt.overwrite,
            )
            if written:
                print(f"saved {written}")
        except Exception as e:  # mirror the reference: collect and continue
            print(f"{car_dir}: {e}")
            errors.append(str(car_dir))
    if errors:
        print("Unfinished cars:")
        print(errors)
    return 1 if errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
