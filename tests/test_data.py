"""Data pipeline tests: synthetic fixtures, dataset reader, loaders, EXR."""

import numpy as np
import pytest

from conditioned_nerf_gan_tpu.data import (
    DataLoader,
    ShapeNetDataset,
    make_synthetic_shapenet,
)
from conditioned_nerf_gan_tpu.data.exr import read_exr


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet")
    return make_synthetic_shapenet(
        root, n_cars=3, n_views=4, img_size=32, n_points=512,
        voxel_resolutions=(32,),
    )


META = {"num_points_ratio": 0.5, "dataset": {}}


def test_split_semantics(dataset_root):
    """train = all-but-last view, val = last view, test = all (datasets.py:59-70)."""
    train = ShapeNetDataset(dataset_root, 32, "twenty", META, False, False,
                            dataset_mode="train", load_depth=False)
    val = ShapeNetDataset(dataset_root, 32, "twenty", META, False, False,
                          dataset_mode="val", load_depth=False)
    test = ShapeNetDataset(dataset_root, 32, "twenty", META, False, False,
                           dataset_mode="test", load_depth=False)
    assert len(train) == 3 * 3
    assert len(val) == 3
    assert len(test) == 3 * 4
    assert len(set(train.data) | set(val.data)) == len(test.data)


def test_sample_contents(dataset_root):
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, load_voxel=True,
                         load_pcl=True, voxel_resolution=32, load_depth=True,
                         shuffle=False)
    s = ds[0]
    assert s["img"].shape == (32, 32, 3)
    assert -1.0 <= s["img"].min() and s["img"].max() <= 1.0
    assert s["cam2world"].shape == (4, 4)
    # camera on radius-1.1 sphere looking at origin
    np.testing.assert_allclose(np.linalg.norm(s["cam2world"][:3, 3]), 1.1, atol=1e-4)
    assert s["voxel"].shape == (32, 32, 32, 4)
    assert 0 < s["voxel"][..., 0].mean() < 0.5  # channel 0 = occupancy
    assert s["pcl"].shape == (256, 6)  # 512 * num_points_ratio
    assert s["depth"].shape == (32, 32)
    fg = s["depth"][s["depth"] > 0]
    assert fg.size > 0 and fg.min() > 0.25 and fg.max() < 1.95


def test_depth_background_is_zero_and_consistent_with_alpha(dataset_root):
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, False, False,
                         load_depth=True, shuffle=False)
    s = ds[0]
    img = s["img"]
    white_bg = (img > 0.97).all(axis=-1)  # white_back renders
    assert (s["depth"][white_bg] == 0).mean() > 0.9


def test_dataloader_batching_and_sharding(dataset_root):
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, False, True,
                         load_depth=False, shuffle=False)
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
    batch = next(iter(dl))
    assert batch["img"].shape == (4, 32, 32, 3)
    assert batch["pcl"].shape == (4, 256, 6)

    # per-process sharding splits the index space disjointly
    seen = []
    for rank in range(2):
        dl_r = DataLoader(ds, batch_size=2, shuffle=True, seed=7,
                          process_index=rank, process_count=2)
        for b in dl_r:
            seen.extend(b["img_path"])
    assert len(seen) == len(set(seen))  # no duplicates across ranks


def test_multifold(dataset_root):
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, False, False,
                         load_depth=False, multifold=5)
    assert len(ds) == 3 * 3 * 5


def test_cond_view_selection(dataset_root):
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, False, False,
                         load_depth=False, cond_mode="nearest", shuffle=False)
    s = ds[0]
    assert s["cond"].shape == (32, 32, 3)


def _exr_rle_compress(raw: bytes) -> bytes:
    """OpenEXR RLE row compressor (plane split + delta predictor + runs)."""
    arr = np.frombuffer(raw, np.uint8)
    planes = np.concatenate([arr[0::2], arr[1::2]])
    enc = planes.astype(np.int16)
    enc[1:] = enc[1:] - planes[:-1].astype(np.int16) + 128
    b = (enc % 256).astype(np.uint8).tobytes()
    out = bytearray()
    i, n = 0, len(b)
    while i < n:
        run = 1
        while i + run < n and b[i + run] == b[i] and run < 127:
            run += 1
        if run >= 2:
            out.append(run - 1)  # count+1 copies
            out.append(b[i])
            i += run
        else:
            j = i
            while j < n and (j - i) < 127:
                if j + 2 < n and b[j] == b[j + 1] == b[j + 2]:
                    break
                j += 1
            out.append(256 - (j - i))  # signed negative: literal run
            out += b[i:j]
            i = j
    return bytes(out)


def _write_exr(path, data: np.ndarray, compression: int):
    """Hand-rolled single-channel half-float scanline EXR writer (test-only)."""
    import struct

    h, w = data.shape
    data = data.astype(np.float16)

    def attr(name, typ, payload):
        return (name.encode() + b"\0" + typ.encode() + b"\0"
                + struct.pack("<i", len(payload)) + payload)

    chan = b"R\0" + struct.pack("<i", 1) + b"\0\0\0\0" + struct.pack("<ii", 1, 1) + b"\0"
    header = b"".join([
        attr("channels", "chlist", chan),
        attr("compression", "compression", bytes([compression])),
        attr("dataWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1)),
        attr("displayWindow", "box2i", struct.pack("<4i", 0, 0, w - 1, h - 1)),
        attr("lineOrder", "lineOrder", b"\0"),
        attr("pixelAspectRatio", "float", struct.pack("<f", 1.0)),
        attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0)),
        attr("screenWindowWidth", "float", struct.pack("<f", 1.0)),
        b"\0",
    ])
    body = b""
    offsets = []
    base = 8 + len(header) + 8 * h
    for y in range(h):
        offsets.append(base + len(body))
        row = data[y].tobytes()
        if compression == 1:
            packed = _exr_rle_compress(row)
            if len(packed) < len(row):  # OpenEXR stores raw if no gain
                row = packed
        body += struct.pack("<ii", y, len(row)) + row
    out = struct.pack("<ii", 20000630, 2) + header
    out += b"".join(struct.pack("<q", o) for o in offsets) + body
    path.write_bytes(out)


def test_exr_roundtrip(tmp_path):
    """Minimal EXR reader handles uncompressed half-float scanlines."""
    h, w = 4, 5
    data = (np.arange(h * w, dtype=np.float32) / 10).reshape(h, w)
    path = tmp_path / "depth.exr"
    _write_exr(path, data, compression=0)
    parsed = read_exr(path)
    np.testing.assert_allclose(
        parsed["R"], data.astype(np.float16).astype(np.float32), atol=1e-3)


def test_exr_rle_roundtrip(tmp_path):
    """RLE (compression id 1) files decode instead of passing through raw
    (r2 verdict: the old path produced garbage silently)."""
    h, w = 8, 16
    # depth-map-like content: large constant background + a blob → compresses
    data = np.full((h, w), 65504.0, np.float32)
    data[2:6, 4:12] = np.linspace(0.5, 1.5, 32).reshape(4, 8)
    path = tmp_path / "depth_rle.exr"
    _write_exr(path, data, compression=1)
    raw = path.read_bytes()
    # ensure at least one chunk actually took the compressed branch
    assert len(raw) < 8 + 700 + 8 * h + h * (8 + w * 2)
    parsed = read_exr(path)
    np.testing.assert_allclose(
        parsed["R"], data.astype(np.float16).astype(np.float32), rtol=1e-3)


def test_exr_rle_corrupt_raises(tmp_path):
    """Truncated/corrupt RLE chunks raise instead of decoding to garbage
    (r3 review: a literal run extending past the buffer silently yielded a
    short chunk and misaligned every following half-float)."""
    import pytest

    from conditioned_nerf_gan_tpu.data.exr import _rle_decompress

    # literal run of 5 bytes but only 2 remain
    with pytest.raises(ValueError, match="literal run"):
        _rle_decompress(bytes([256 - 5, 1, 2]))
    # repeat run missing its value byte
    with pytest.raises(ValueError, match="value byte"):
        _rle_decompress(bytes([3]))

    # end-to-end: truncate a valid RLE file's last chunk body
    h, w = 8, 16
    data = np.full((h, w), 65504.0, np.float32)
    data[2:6, 4:12] = np.linspace(0.5, 1.5, 32).reshape(4, 8)
    path = tmp_path / "depth_rle.exr"
    _write_exr(path, data, compression=1)
    raw = bytearray(path.read_bytes())
    bad = tmp_path / "trunc.exr"
    bad.write_bytes(bytes(raw[:-4]))  # cut into the final chunk
    with pytest.raises(ValueError):
        read_exr(bad)


def test_sample_content_is_pure_in_epoch_and_index(dataset_root):
    """A sample's rng-dependent content (pcl subsample, cond pick) is a pure
    function of (seed, epoch, index) — not of access order/count. This is
    the invariant that lets a resumed run jump the loader to the
    checkpointed position without decoding the skipped batches."""
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, False, True,
                         load_depth=False, cond_mode="random", shuffle=False)
    ds.reseed(3)
    a = ds[2]
    # interleave other accesses and re-read: identical content
    _ = ds[0], ds[1], ds[2], ds[1]
    b = ds[2]
    np.testing.assert_array_equal(a["pcl"], b["pcl"])
    np.testing.assert_array_equal(a["cond"], b["cond"])
    # different epoch -> different subsample stream
    ds.reseed(4)
    c = ds[2]
    assert not np.array_equal(a["pcl"], c["pcl"])


def test_dataloader_start_batch_skips_without_decoding(dataset_root):
    """DataLoader.start_batch=k yields exactly the full epoch's batches[k:],
    and never calls __getitem__ for the skipped ones."""
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, False, True,
                         load_depth=False, shuffle=False)
    full = DataLoader(ds, batch_size=2, shuffle=True, seed=11)
    batches = list(full)
    assert len(batches) >= 3

    ds2 = ShapeNetDataset(dataset_root, 32, "twenty", META, False, True,
                          load_depth=False, shuffle=False)
    loads = []
    orig = type(ds2).__getitem__

    class Counting(ShapeNetDataset):
        def __getitem__(self, index):
            loads.append(index)
            return orig(self, index)

    ds2.__class__ = Counting
    skip = DataLoader(ds2, batch_size=2, shuffle=True, seed=11)
    skip.start_batch = 2
    resumed = list(skip)
    assert len(resumed) == len(batches) - 2
    assert len(loads) == 2 * len(resumed)  # skipped batches never decoded
    for got, want in zip(resumed, batches[2:]):
        np.testing.assert_array_equal(got["img"], want["img"])
        np.testing.assert_array_equal(got["pcl"], want["pcl"])
        assert got["img_path"] == want["img_path"]


def test_dataloader_worker_error_raises_instead_of_hanging(dataset_root):
    """A decode error in the prefetch worker must surface in the consumer
    (r3 review: a dying worker left the main thread blocked on q.get()
    forever — a corrupt PNG mid-epoch would wedge training silently)."""
    ds = ShapeNetDataset(dataset_root, 32, "twenty", META, False, True,
                         load_depth=False, shuffle=False)

    class Corrupt(ShapeNetDataset):
        def __getitem__(self, index):
            raise OSError("truncated PNG")

    ds.__class__ = Corrupt
    dl = DataLoader(ds, batch_size=2, shuffle=False, seed=0)
    with pytest.raises(RuntimeError, match="DataLoader worker failed") as exc:
        next(iter(dl))
    assert isinstance(exc.value.__cause__, OSError)


def test_write_exr_depth_overflow_clips_to_foreground(tmp_path):
    """Finite depth beyond the float16 max must stay FOREGROUND: naive
    half-casting overflows to inf (or collides with the 65504 background
    sentinel) and reads back as background 0 (r4 review finding)."""
    from conditioned_nerf_gan_tpu.data.exr import read_exr_depth, write_exr_depth

    depth = np.full((8, 8), np.inf, np.float32)     # background
    depth[2, 2] = 1.0                                # ordinary foreground
    depth[3, 3] = 70000.0                            # > half max 65504
    path = tmp_path / "far.exr"
    write_exr_depth(path, depth)
    back = read_exr_depth(path, img_size=8)
    assert back[2, 2] == pytest.approx(1.0, rel=1e-3)
    assert back[3, 3] > 0, "finite far depth became background"
    assert back[3, 3] == pytest.approx(65472.0)      # largest half < sentinel
    assert back[0, 0] == 0.0                         # background stays 0
