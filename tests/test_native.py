"""Native fastload data-path tests (compiled on first use; skip if no g++)."""

import time

import numpy as np
import pytest

from conditioned_nerf_gan_tpu.data import native


@pytest.fixture(scope="module")
def png_files(tmp_path_factory):
    import cv2

    root = tmp_path_factory.mktemp("pngs")
    rng = np.random.default_rng(0)
    paths, truths = [], []
    for i in range(6):
        img = rng.random((64, 64, 3)).astype(np.float32)
        rgba = np.concatenate([img[..., ::-1], np.ones_like(img[..., :1])], -1)
        p = root / f"{i}.png"
        cv2.imwrite(str(p), (rgba * 65535).astype(np.uint16))
        paths.append(p)
        truths.append(img)
    return paths, truths


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_decode_matches_cv2(png_files):
    import cv2

    paths, truths = png_files
    out = native.read_png16(paths[0], 64, scale=1.0, shift=0.0)
    np.testing.assert_allclose(out, truths[0], atol=2e-4)

    # resized decode vs cv2 — integer INTER_AREA downscale, fractional
    # INTER_AREA downscale, and INTER_LINEAR upscale (the python loader's
    # mode split, data/shapenet.py:41)
    for size in (32, 40, 128):
        out = native.read_png16(paths[0], size, scale=1.0, shift=0.0)
        mode = cv2.INTER_LINEAR if size > 64 else cv2.INTER_AREA
        ref = cv2.resize(truths[0], (size, size), interpolation=mode)
        np.testing.assert_allclose(out, ref, atol=2e-3, err_msg=f"size {size}")


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_batch_decode_threads(png_files):
    paths, truths = png_files
    out = native.read_png16_batch(paths, 64, scale=1.0, shift=0.0, n_threads=4)
    assert out.shape == (6, 64, 64, 3)
    for i in range(6):
        np.testing.assert_allclose(out[i], truths[i], atol=2e-4)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_normalization_matches_dataset(png_files):
    paths, truths = png_files
    out = native.read_png16(paths[0], 64)  # default ×2−1
    np.testing.assert_allclose(out, truths[0] * 2 - 1, atol=4e-4)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_dataset_native_path(tmp_path, monkeypatch):
    from conditioned_nerf_gan_tpu.data import ShapeNetDataset, make_synthetic_shapenet

    root = make_synthetic_shapenet(tmp_path, n_cars=1, n_views=2, img_size=32,
                                   n_points=128, voxel_resolutions=(32,))
    meta = {"num_points_ratio": 1.0, "dataset": {}}
    ds_cv = ShapeNetDataset(root, 32, "twenty", meta, False, False,
                            load_depth=False, shuffle=False)
    monkeypatch.setenv("CNG_NATIVE_LOADER", "1")
    ds_nat = ShapeNetDataset(root, 32, "twenty", meta, False, False,
                             load_depth=False, shuffle=False)
    assert ds_nat._use_native
    a = ds_cv[0]["img"]
    b = ds_nat[0]["img"]
    np.testing.assert_allclose(a, b, atol=1e-3)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_bad_file_error(tmp_path):
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"not a png")
    with pytest.raises(RuntimeError, match="-2"):
        native.read_png16(bad, 32)
    with pytest.raises(RuntimeError):
        native.read_png16(tmp_path / "missing.png", 32)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_corrupt_png_rejected(png_files, tmp_path):
    """File-controlled chunk lengths / truncations must error, not read OOB."""
    import struct

    paths, _ = png_files
    good = paths[0].read_bytes()

    def expect_error(data, name):
        p = tmp_path / f"{name}.png"
        p.write_bytes(data)
        with pytest.raises(RuntimeError):
            native.read_png16(p, 32)

    # 1. truncated mid-chunk (IDAT length field points past EOF)
    expect_error(good[: len(good) // 2], "truncated")
    # 2. IHDR length lies (shorter than the 13 bytes the parser reads)
    lying = bytearray(good)
    lying[8:12] = struct.pack(">I", 4)  # IHDR len 13 → 4
    expect_error(bytes(lying), "short_ihdr")
    # 3. first chunk length enormous (payload would run off the buffer)
    huge = bytearray(good)
    huge[8:12] = struct.pack(">I", 0x7FFFFFFF)
    expect_error(bytes(huge), "huge_len")
    # 4. absurd dimensions (allocation bomb)
    bomb = bytearray(good)
    bomb[16:20] = struct.pack(">I", 0x40000000)  # width
    expect_error(bytes(bomb), "dim_bomb")
    # 5. truncated IDAT *stream* (valid zlib prefix, inflates short)
    import zlib

    # rebuild a png whose IDAT decompresses to fewer bytes than W*H needs
    w = h = 8
    ihdr = struct.pack(">II5B", w, h, 16, 2, 0, 0, 0)
    short_raw = bytes((1 + w * 6) * (h // 2))  # only half the scanlines

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload)) + tag + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(short_raw))
        + chunk(b"IEND", b"")
    )
    expect_error(data, "short_stream")


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("compression", [0, 1])
def test_exr_depth_matches_python_reader(tmp_path, compression):
    """C++ EXR depth decode == data/exr.py::read_exr_depth on NONE and RLE
    files (half-float R channel, 65504->inf->0 background convention)."""
    from test_data import _write_exr

    from conditioned_nerf_gan_tpu.data.exr import read_exr_depth

    h = w = 32
    rng = np.random.default_rng(7 + compression)
    depth = rng.uniform(0.3, 1.9, (h, w)).astype(np.float32)
    depth[:6] = 65504.0  # background band (half max)
    depth[10:12, 4:9] = 65504.0
    path = tmp_path / f"d{compression}.exr"
    _write_exr(path, depth, compression=compression)

    # identity, integer + fractional area downscale, bilinear upscale —
    # all four cv2.resize regimes of the python reader (data/exr.py:168)
    for size in (32, 16, 20, 64):
        ref = read_exr_depth(path, size).astype(np.float32)
        got = native.read_exr_depth_native(path, size)
        np.testing.assert_allclose(got, ref, atol=2e-3,
                                   err_msg=f"size {size} comp {compression}")
        assert (got[: 6 * size // h] == 0).all()  # background zeroed


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_exr_depth_batch_threadpool(tmp_path):
    from test_data import _write_exr

    rng = np.random.default_rng(0)
    paths, refs = [], []
    for i in range(5):
        d = rng.uniform(0.3, 1.9, (16, 16)).astype(np.float32)
        p = tmp_path / f"{i}.exr"
        _write_exr(p, d, compression=1)
        paths.append(p)
        refs.append(native.read_exr_depth_native(p, 16))
    batch = native.read_exr_depth_batch(paths, 16, n_threads=3)
    np.testing.assert_allclose(batch, np.stack(refs), atol=0)


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_get_batch_matches_itemwise(tmp_path, monkeypatch):
    """DataLoader batches route decode through one C++ thread-pool call per
    field (ShapeNetDataset.get_batch); result must match the per-item path,
    including a batch mixing EXR depths (deferred) with .npy fixture depths
    (decoded inline)."""
    from test_data import _write_exr

    from conditioned_nerf_gan_tpu.data import ShapeNetDataset, make_synthetic_shapenet
    from conditioned_nerf_gan_tpu.data.shapenet import _collate

    root = make_synthetic_shapenet(tmp_path, n_cars=2, n_views=4, img_size=32,
                                   n_points=128, voxel_resolutions=(32,))
    # give car0 real EXR depths so the batch mixes deferred + inline depth
    rng = np.random.default_rng(3)
    car0_depth = root / "car0000" / "depth"
    for i in range(4):
        d = rng.uniform(0.3, 1.9, (32, 32)).astype(np.float32)
        _write_exr(car0_depth / f"{i:04}0001.exr", d, compression=1)

    meta = {"num_points_ratio": 1.0, "dataset": {}}
    monkeypatch.setenv("CNG_NATIVE_LOADER", "1")
    ds = ShapeNetDataset(root, 32, "twenty", meta, True, True,
                         load_depth=True, cond_mode="nearest", shuffle=False,
                         voxel_resolution=32)
    assert ds._use_native
    indices = list(range(6))  # spans both cars
    batched = ds.get_batch(indices)
    itemwise = _collate([ds[i] for i in indices])
    assert set(batched) == set(itemwise)
    for key in itemwise:
        if key == "img_path":
            assert batched[key] == itemwise[key]
        else:
            np.testing.assert_allclose(
                batched[key], itemwise[key], atol=1e-6, err_msg=key
            )
