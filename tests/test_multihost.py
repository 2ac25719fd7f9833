"""Multi-host execution parity: 2 processes x 4 devices == 1 process x 8.

The reference's multi-GPU path is mp.spawn + gloo + DDP + dist.barrier()
(reference train.py:36-44,231-246, utils.py:988,1000). The TPU-native
equivalent (jax.distributed + global-array assembly + SPMD psum over the
global mesh) is validated here on localhost: two real OS processes with 4
virtual CPU devices each run the full GAN train step over one global
8-device mesh, and the updated parameters must match the single-process
8-device run bit-for-tolerance.
"""

import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

import multihost_common as mh

REPO_ROOT = Path(__file__).resolve().parent.parent
WORKER = Path(__file__).resolve().parent / "multihost_worker.py"

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_step_matches_single_process(tmp_path):
    port = _free_port()
    out_npz = tmp_path / "proc0.npz"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(port), str(out_npz)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO_ROOT),
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    assert out_npz.exists()
    got = np.load(out_npz)

    # single-process 8-device reference, same program + data
    from conditioned_nerf_gan_tpu.parallel import make_mesh

    mesh = make_mesh()
    ref_metrics, ref_flat = mh.run_one_step(mesh, mh.global_batch())

    for k, v in ref_metrics.items():
        np.testing.assert_allclose(
            float(got[f"metric_{k}"]), v, rtol=1e-4, atol=1e-5,
            err_msg=f"metric {k} diverges between 2-process and 1-process",
        )
    np.testing.assert_allclose(
        got["flat"], ref_flat, rtol=1e-4, atol=1e-5,
        err_msg="post-step params diverge between 2-process and 1-process",
    )
    # the manual shard_map step ran cross-process in the workers (finite
    # metrics asserted there); spot-check its metrics landed in the npz
    manual_keys = [k for k in got.files if k.startswith("manual_metric_")]
    assert manual_keys, "manual shard_map step metrics missing from worker npz"
    for k in manual_keys:
        assert np.isfinite(float(got[k])), k


def test_global_array_assembly_single_process():
    """shard_batch's make_array_from_process_local_data path (force_global)
    must place data identically to the device_put path."""
    import jax

    from conditioned_nerf_gan_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh()
    batch = mh.global_batch()
    a = shard_batch(batch, mesh)
    b = shard_batch(batch, mesh, force_global=True)
    for k in a:
        assert a[k].sharding.is_equivalent_to(b[k].sharding, a[k].ndim)
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
    # replicated assembly is exercised via jax.device_put equivalence
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    x = jax.device_put(batch["img"], repl)
    assert np.asarray(x).shape == batch["img"].shape


def test_two_process_trainer_loop(tmp_path):
    """Full multi-host Trainer loop on localhost: 2 processes x 4 devices
    train over one shared output dir through checkpointing AND the FID
    evaluation (cross-process barriers + per-process image shards) — the
    path the reference guards with its two dist.barrier() calls
    (utils.py:988,1000)."""
    from conditioned_nerf_gan_tpu.data import make_synthetic_shapenet

    data_root = make_synthetic_shapenet(
        tmp_path / "data", n_cars=3, n_views=4, img_size=32, n_points=512,
        voxel_resolutions=(32,),
    )
    out = tmp_path / "run"
    out.mkdir()
    port = _free_port()
    worker = Path(__file__).resolve().parent / "multihost_trainer_worker.py"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), str(out),
             str(data_root)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd=str(REPO_ROOT),
        )
        for i in range(2)
    ]
    outputs = [p.communicate(timeout=1800)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"trainer worker {i} failed:\n{o[-5000:]}"

    # main-process artifacts: checkpoint, curriculum, stamped fid.txt
    assert list((out / "checkpoints").glob("*.ckpt"))
    assert (out / "curriculum.json").exists()
    fid_txt = (out / "fid.txt").read_text()
    assert fid_txt.startswith("# RANDOM-INIT FEATURES")
    assert len(fid_txt.strip().splitlines()) >= 2

    # the two processes' eval image shards must union to the whole fidset
    # (their writes happened before the post-shard barrier)
    eval_imgs = {p.name for p in (out / "evaluation").glob("*.png")}
    expected = set()
    for car in sorted(p.name for p in data_root.iterdir() if p.is_dir()):
        for v in range(4):
            expected.add(f"{car}_{v:04}.png")
    assert eval_imgs == expected, (
        f"missing {sorted(expected - eval_imgs)[:5]} "
        f"extra {sorted(eval_imgs - expected)[:5]}"
    )


def test_two_process_chained_windows(tmp_path):
    """steps_per_dispatch through the REAL 2-process path: chained windows
    assemble stacked (k, B, ...) global arrays from process-local shards
    (shard_batch batch_axis=1 + make_array_from_process_local_data) and the
    resulting training trajectory matches the per-step multi-process run —
    the DDP-path analogue of the single-process chained-parity test
    (reference train.py:36-44 is the mp.spawn path this harness models)."""
    from conditioned_nerf_gan_tpu.data import make_synthetic_shapenet

    # 11 cars x 3 train views = 33 samples -> 17/16 per process -> 4
    # batches/epoch/process at the smoke batch_size 4 (global 8 = mesh size)
    data_root = make_synthetic_shapenet(
        tmp_path / "data", n_cars=11, n_views=4, img_size=32, n_points=512,
        voxel_resolutions=(32,),
    )
    worker = Path(__file__).resolve().parent / "multihost_trainer_worker.py"
    hist = {}
    for spd in (1, 4):
        out = tmp_path / f"run_spd{spd}"
        out.mkdir()
        port = _free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), str(i), str(port), str(out),
                 str(data_root), str(spd)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=str(REPO_ROOT),
            )
            for i in range(2)
        ]
        outputs = [p.communicate(timeout=1800)[0] for p in procs]
        for i, (p, o) in enumerate(zip(procs, outputs)):
            assert p.returncode == 0, (
                f"spd={spd} worker {i} failed:\n{o[-5000:]}"
            )
        hist[spd] = np.load(out / "histories.npz")

    for key in ("photometry_losses", "generator_losses",
                "discriminator_losses"):
        h_a, h_b = hist[1][key], hist[4][key]
        assert h_a.shape == h_b.shape == (10,), key
        assert np.isfinite(h_b).all(), key
        # same tolerances as the single-process chained-parity test: the
        # scan body reassociates reductions, so step 0 is ulp-tight and the
        # first window tracks within reassociation drift
        np.testing.assert_allclose(h_b[0], h_a[0], rtol=1e-5, err_msg=key)
        np.testing.assert_allclose(h_b[:4], h_a[:4], rtol=0.05, atol=0.02,
                                   err_msg=key)
