"""In-training FID evaluation loop.

Parity target: reference fid_evaluation.py —
  * `setup_evaluation` writes real images once per (dataset, subset, size) to
    a shared cache dir (:56-86); here the cache root defaults next to the
    dataset (CNG_EVAL_IMAGES overrides) instead of the author's cluster home.
  * `output_images` renders the fid subset at 128² with each process writing
    its own shard (:89-164); file names are `{car}_{view}.png` so that
    metric_utils-style pairing works.
  * `evaluate_trainer` glues both to `compute_metrics_from_dirs`
    (reference utils.py:974-1016).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..data import DataLoader, ShapeNetDataset
from ..utils.image import to_uint8


def _img_name(img_path: str) -> str:
    parts = Path(img_path).parts
    return f"{parts[-3]}_{parts[-1]}"  # {car}_{view:04}.png


def _save_png(img01: np.ndarray, path: Path) -> None:
    import cv2

    cv2.imwrite(str(path), to_uint8(img01)[..., ::-1])


def setup_evaluation(metadata: dict) -> str:
    """Write real eval images once; returns the real-image directory."""
    root = os.environ.get(
        "CNG_EVAL_IMAGES",
        str(Path(metadata["dataset"]["path"]).parent / "EvalImages"),
    )
    real_dir = (
        Path(root)
        / Path(metadata["dataset"]["path"]).stem
        / f"{metadata['fid']['subset']}_{metadata['fid']['target_size']}"
    )
    if not real_dir.exists():
        real_dir.mkdir(parents=True)
        dataset = ShapeNetDataset(
            metadata["dataset"]["path"],
            metadata["fid"]["target_size"],
            metadata["fid"]["subset"],
            metadata,
            load_voxel=False,
            load_pcl=False,
            dataset_mode="test",
            load_depth=False,
            load_cam=False,
            shuffle=False,
        )
        print("Outputting real images...")
        # chunked through get_batch: with the native loader active each
        # chunk's PNGs decode in one C++ thread-pool call
        chunk = 32
        for start in range(0, len(dataset), chunk):
            batch = dataset.get_batch(list(range(start, min(start + chunk,
                                                            len(dataset)))))
            for img, path in zip(batch["img"], batch["img_path"]):
                _save_png(img * 0.5 + 0.5, real_dir / _img_name(path))
        print("...done")
    return str(real_dir)


def output_images(
    trainer,
    metadata: dict,
    output_dir: str | Path,
    process_index: int = 0,
    process_count: int = 1,
) -> None:
    """Render the fid subset and write this process's shard of images."""
    dataset = trainer.fidset
    img_size = metadata["fid"]["target_size"]
    num_steps = metadata["num_steps"]
    # the reference's rule (fid_evaluation.py:95-98) is an A40 VRAM bound;
    # the TPU render is ray-chunked (forward memory ~ chunk, not image), so
    # presets override with fid.render_batch — per-sample renders are
    # batch-invariant (rng=None), only dispatch count changes
    render_batch = metadata["fid"].get("render_batch")
    if render_batch is not None and render_batch < 1:
        raise ValueError(f"fid.render_batch must be >= 1, got {render_batch}")
    batch_size = render_batch if render_batch is not None else (
        2 if num_steps > 48 else 8
    )
    loader = DataLoader(
        dataset, batch_size, shuffle=False, drop_last=False,
        process_index=process_index, process_count=process_count,
    )
    out = Path(output_dir)
    out.mkdir(parents=True, exist_ok=True)
    print(f"Generating {len(dataset)} images at {out}")
    for batch in loader:
        cond = {
            k: jnp.asarray(v) for k, v in batch.items() if k in ("pcl", "voxel")
        }
        z = trainer.encode_batch(cond)
        cams = jnp.asarray(batch["cam2world"])
        rgb, _ = trainer.generate_img(
            z, cams, img_size=img_size, num_steps=num_steps
        )
        rgb01 = np.asarray(rgb) * 0.5 + 0.5
        for idx, img in enumerate(rgb01):
            _save_png(img, out / _img_name(batch["img_path"][idx]))


def append_fid_line(path, step: int, fid, ofid, lpips_score, psnr) -> None:
    """Append one metric line in the reference's fid.txt format
    (utils.py:1009-1012), stamping the file first when the metric nets are
    random-init (tools/plots.plot_fid skips the stamp)."""
    from .weights import stamp_metric_log

    stamp_metric_log(path)
    with open(path, "a") as f:
        f.write(f"\n{step} {fid} {ofid} {lpips_score} {psnr}")


def evaluate_trainer(trainer, metadata: dict):
    """Full eval pass; returns (fid, ofid, lpips, psnr) on the main process."""
    from .metrics import compute_metrics_from_dirs

    from ..parallel import sync_processes

    real_dir = None
    if trainer.is_main:
        real_dir = setup_evaluation(metadata)
    # Barriers around the filesystem rendezvous (the reference's
    # dist.barrier() pair, utils.py:988,1000): every process renders and
    # writes its own image shard, and the main process must not score the
    # directory until all shards are on disk.
    sync_processes("eval_setup_done")
    output_images(
        trainer, metadata, trainer.evaluation_path,
        trainer.process_index, trainer.process_count,
    )
    sync_processes("eval_image_shards_written")
    results = None
    if trainer.is_main:
        val_lst = Path(metadata["dataset"]["path"]).parent / "val.lst"
        if not val_lst.exists():
            print(f"val.lst not found at {val_lst}; skipping paired metrics")
            from .metrics import compute_fid_from_dirs

            fid = compute_fid_from_dirs(real_dir, trainer.evaluation_path)
            results = (fid, float("nan"), float("nan"), float("nan"))
        else:
            results = compute_metrics_from_dirs(
                real_dir, trainer.evaluation_path, val_lst
            )
    # third barrier (beyond the reference's pair): the main process just
    # spent up to minutes scoring metrics — without this, the other
    # processes' NEXT training-step collective would sit in the 30 s gloo
    # rendezvous window waiting for it and time out.
    sync_processes("eval_metrics_done")
    return results
