"""End-to-end dataset production orchestrator.

The reference ships the pipeline as disconnected stages glued by hand
(`prepare_data.sh` symlinks the raw ShapeNet renders; blender_renderer/,
misc/write_pcl_color.py, feature_volume/pcl2voxel.py each run separately).
This CLI chains every stage into one command that turns a directory of
meshes (or an existing render tree) into a ready-to-train dataset:

  1. render   — Blender batch render of each .obj → image/depth/normal +
                cameras.npz + pointcloud.npz (tools/blender/render_shapenet.py;
                skipped automatically when no `blender` binary is available)
  2. pcl      — depth-backprojected colored point clouds → pcl_color.npy
                (tools/write_pcl_color.py)
  3. voxel    — pcl → occupancy+RGB voxel grids at the requested resolutions
                (tools/pcl2voxel.py; voxel.npz / voxel_32.npz / voxel_128.npz)
  4. lst      — split lists next to the dataset root: all cars, first-20,
                single, and val (data/shapenet.py consumes
                `{root_parent}/{name}.lst`; reference datasets.py:48-70)

Usage:
  python -m conditioned_nerf_gan_tpu.tools.prepare_data ROOT \
      [--meshes DIR] [--views 24] [--resolutions 32 64] [--skip_render]
"""

from __future__ import annotations

import argparse
import shutil
import subprocess
import sys
from pathlib import Path

import numpy as np

from .pcl2voxel import save_voxel_npz
from .write_pcl_color import build_pcl_color

BLENDER_SCRIPT = Path(__file__).resolve().parent / "blender" / "render_shapenet.py"

# voxel filename per resolution (reference datasets.py:131-157 contract)
VOXEL_NAMES = {64: "voxel.npz", 32: "voxel_32.npz", 128: "voxel_128.npz"}


def voxel_name(res: int) -> str:
    return VOXEL_NAMES.get(res, f"voxel_{res}.npz")


def render_meshes(mesh_dir: Path, root: Path, views: int, resolution: int,
                  blender: str = "blender") -> list[str]:
    """Stage 1: Blender-render every .obj under mesh_dir into root/{car}/."""
    objs = sorted(mesh_dir.rglob("*.obj"))
    if not objs:
        print(f"no .obj meshes under {mesh_dir}")
        return []
    failures = []
    for obj in objs:
        cmd = [
            blender, "--background", "--python", str(BLENDER_SCRIPT), "--",
            str(obj), "--output_folder", str(root), "--views", str(views),
            "--resolution", str(resolution),
        ]
        print("render:", obj)
        proc = subprocess.run(cmd, capture_output=True, text=True)
        if proc.returncode != 0:
            print(proc.stdout[-2000:], proc.stderr[-2000:], sep="\n")
            failures.append(str(obj))
    return failures


def car_dirs(root: Path) -> list[Path]:
    return sorted(
        p for p in root.iterdir()
        if p.is_dir() and (p / "cameras.npz").exists()
    )


def build_pcls(root: Path, views: int, pcl_size: int, img_size: int,
               overwrite: bool) -> list[str]:
    """Stage 2: pcl_color.npy for every rendered car."""
    failures = []
    for car in car_dirs(root):
        try:
            written = build_pcl_color(car, views, pcl_size, img_size,
                                      overwrite=overwrite)
            if written:
                print("pcl:", written)
        except Exception as e:
            print(f"pcl FAILED {car}: {e}")
            failures.append(car.name)
    return failures


def build_voxels(root: Path, resolutions: list[int], overwrite: bool,
                 noise_color: float = 0.0, noise_xyz: float = 0.0) -> list[str]:
    """Stage 3: voxel npz grids at each resolution."""
    rng = np.random.default_rng(0)
    failures = []
    for car in car_dirs(root):
        if not (car / "pcl_color.npy").exists():
            continue
        for res in resolutions:
            name = voxel_name(res)
            if (car / name).exists() and not overwrite:
                continue
            try:
                out = save_voxel_npz(car, res, noise_color=noise_color,
                                     noise_xyz=noise_xyz, rng=rng)
                print("voxel:", out)
            except Exception as e:
                print(f"voxel FAILED {car} @ {res}: {e}")
                failures.append(f"{car.name}@{res}")
    return failures


def complete_cars(root: Path, resolutions: list[int]) -> list[str]:
    """Cars that finished every stage: cameras.npz + pcl_color.npy + each
    requested voxel grid. Cars whose pcl/voxel stage failed must not reach
    the split lists — a training run with load_pcl/load_voxel would crash
    on the missing artifact mid-epoch."""
    out = []
    for car in car_dirs(root):
        if not (car / "pcl_color.npy").exists():
            continue
        if any(not (car / voxel_name(r)).exists() for r in resolutions):
            continue
        out.append(car.name)
    return out


def write_lists(root: Path, cars: list[str], overwrite: bool) -> None:
    """Stage 4: split lists in root's parent (data/shapenet.py contract)."""
    listing = {
        "thousand": cars,
        "twenty": cars[:20],
        "single": cars[:1],
        # one held-out view per car comes from dataset_mode="val"; val.lst
        # names which cars the paired eval covers (reference datasets.py:59-70)
        "val": cars,
    }
    for name, ids in listing.items():
        lst = root.parent / f"{name}.lst"
        if lst.exists() and not overwrite:
            continue
        lst.write_text("\n".join(ids) + ("\n" if ids else ""))
        print(f"lst: {lst} ({len(ids)} cars)")


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    parser.add_argument("root", help="dataset root to produce, e.g. .../ShapeNetCar")
    parser.add_argument("--meshes", type=str, default=None,
                        help="directory of .obj meshes to Blender-render first")
    parser.add_argument("--views", type=int, default=24)
    parser.add_argument("--render_resolution", type=int, default=256)
    parser.add_argument("--pcl_size", type=int, default=100_000)
    parser.add_argument("--pcl_img_size", type=int, default=256)
    parser.add_argument("--resolutions", type=int, nargs="*", default=[32, 64])
    parser.add_argument("--noise_color", type=float, default=0.0)
    parser.add_argument("--noise_xyz", type=float, default=0.0)
    parser.add_argument("--skip_render", action="store_true")
    parser.add_argument("--overwrite", action="store_true")
    parser.add_argument("--blender", type=str, default="blender")
    args = parser.parse_args(argv)

    root = Path(args.root)
    root.mkdir(parents=True, exist_ok=True)
    failures: list[str] = []

    if args.meshes and not args.skip_render:
        if shutil.which(args.blender) is None:
            print(f"'{args.blender}' not found — skipping the render stage "
                  "(pass --blender or render on a machine with Blender)")
        else:
            failures += render_meshes(Path(args.meshes), root, args.views,
                                      args.render_resolution, args.blender)

    if not car_dirs(root):
        print(f"no rendered cars under {root} (need {{car}}/cameras.npz trees)")
        return 1

    failures += build_pcls(root, args.views, args.pcl_size, args.pcl_img_size,
                           args.overwrite)
    failures += build_voxels(root, args.resolutions, args.overwrite,
                             args.noise_color, args.noise_xyz)
    cars = complete_cars(root, args.resolutions)
    write_lists(root, cars, args.overwrite)

    n_rendered = len(car_dirs(root))
    print(f"dataset ready: {len(cars)} complete cars at {root}"
          + (f" ({n_rendered - len(cars)} incomplete, excluded from lists)"
             if n_rendered != len(cars) else ""))
    if failures:
        print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
