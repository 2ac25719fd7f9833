"""Eval stack tests: feature nets, FID/oFID/LPIPS/PSNR, pairing protocol."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conditioned_nerf_gan_tpu.eval.metrics import (
    compute_fid_from_dirs,
    compute_metrics_from_dirs,
    compute_psnr,
    frechet_distance,
    newton_schulz_sqrt_trace,
)


@pytest.mark.slow
def test_inception_feature_shapes():
    from conditioned_nerf_gan_tpu.eval.inception import get_inception

    model, params = get_inception()
    imgs = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)), jnp.float32)
    f768, f2048 = jax.jit(model.apply)(params, imgs)
    assert f768.shape == (2, 17, 17, 768)
    assert f2048.shape == (2, 2048)
    assert np.isfinite(np.asarray(f768)).all()
    assert np.isfinite(np.asarray(f2048)).all()


def test_lpips_properties():
    from conditioned_nerf_gan_tpu.eval.lpips import get_lpips

    model, params = get_lpips()
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.random((2, 64, 64, 3)) * 2 - 1, jnp.float32)
    b = jnp.asarray(rng.random((2, 64, 64, 3)) * 2 - 1, jnp.float32)
    fn = jax.jit(model.apply)
    d_same = np.asarray(fn(params, a, a))
    d_diff = np.asarray(fn(params, a, b))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    assert (d_diff > 0).all()


def test_frechet_distance_analytic():
    """Identical Gaussians → 0; mean shift → squared distance."""
    dim = 8
    rng = np.random.default_rng(2)
    a = rng.normal(size=(500, dim))
    mu, sigma = a.mean(0), np.cov(a, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-6
    shift = np.ones(dim) * 2.0
    d = frechet_distance(mu, sigma, mu + shift, sigma)
    np.testing.assert_allclose(d, shift.dot(shift), rtol=1e-5)


def test_newton_schulz_matches_scipy():
    from scipy import linalg

    rng = np.random.default_rng(3)
    a = rng.normal(size=(16, 16))
    spd = a @ a.T + np.eye(16) * 0.1
    exact = np.trace(linalg.sqrtm(spd))
    approx = float(newton_schulz_sqrt_trace(jnp.asarray(spd)))
    np.testing.assert_allclose(approx, exact.real, rtol=1e-3)


def test_psnr():
    a = np.zeros((2, 8, 8, 3), np.float32)
    b = np.full_like(a, 0.1)
    np.testing.assert_allclose(compute_psnr(a, b), 20.0, atol=1e-4)


@pytest.fixture(scope="module")
def image_dirs(tmp_path_factory):
    """Paired {car}_{i:04}.png dirs: gen = real + slight noise."""
    import cv2

    root = tmp_path_factory.mktemp("metrics")
    real, gen = root / "real", root / "gen"
    real.mkdir(), gen.mkdir()
    rng = np.random.default_rng(4)
    cars = ["carA", "carB"]
    for car in cars:
        base = rng.random((12, 32, 32, 3))
        noisy = np.clip(base + rng.normal(0, 0.05, base.shape), 0, 1)
        for i in range(12):
            cv2.imwrite(str(real / f"{car}_{i:04}.png"),
                        (base[i, :, :, ::-1] * 255).astype(np.uint8))
            cv2.imwrite(str(gen / f"{car}_{i:04}.png"),
                        (noisy[i, :, :, ::-1] * 255).astype(np.uint8))
    (root / "val.lst").write_text("\n".join(cars) + "\n")
    return root


@pytest.mark.slow
def test_fid_identical_dirs_is_zero(image_dirs):
    fid = compute_fid_from_dirs(image_dirs / "real", image_dirs / "real")
    assert abs(fid) < 1e-3


@pytest.mark.slow
def test_compute_metrics_from_dirs(image_dirs):
    fid, ofid, lpips_score, psnr = compute_metrics_from_dirs(
        image_dirs / "real", image_dirs / "gen", image_dirs / "val.lst",
        views_per_car=12,
    )
    assert np.isfinite([fid, ofid, lpips_score, psnr]).all()
    assert fid > 0 and ofid > 0 and lpips_score > 0
    assert 20 < psnr < 35  # 0.05-sigma noise ≈ 26 dB


def test_stamp_metric_log_names_uncalibrated_nets(tmp_path, monkeypatch):
    """The fid.txt stamp names exactly which metric columns are random-init:
    porting only the Inception weights keeps FID/oFID publishable while
    still flagging LPIPS (r3 review: the all-or-nothing stamp discarded
    valid FID numbers)."""
    from conditioned_nerf_gan_tpu.eval.weights import stamp_metric_log

    # neither ported: both named
    monkeypatch.delenv("CNG_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.delenv("CNG_LPIPS_WEIGHTS", raising=False)
    p = tmp_path / "fid_none.txt"
    stamp_metric_log(p)
    text = p.read_text()
    assert "FID/oFID" in text and "LPIPS" in text

    # only Inception ported: stamp flags LPIPS alone
    fake = tmp_path / "inception.npz"
    fake.write_bytes(b"x")
    monkeypatch.setenv("CNG_INCEPTION_WEIGHTS", str(fake))
    p2 = tmp_path / "fid_partial.txt"
    stamp_metric_log(p2)
    text2 = p2.read_text()
    assert "LPIPS" in text2 and "FID/oFID" not in text2

    # both ported: no stamp at all
    fake2 = tmp_path / "lpips.npz"
    fake2.write_bytes(b"x")
    monkeypatch.setenv("CNG_LPIPS_WEIGHTS", str(fake2))
    p3 = tmp_path / "fid_cal.txt"
    stamp_metric_log(p3)
    assert not p3.exists()


def test_stamp_metric_log_flags_uncalibrated_append(tmp_path, monkeypatch):
    """A pre-existing calibrated fid.txt being resumed WITHOUT the weight env
    vars (the lost-env requeue case) still gets stamped before uncalibrated
    lines land — and the stamp is idempotent across repeated appends
    (r3 review: path.exists() used to short-circuit the stamp entirely)."""
    from conditioned_nerf_gan_tpu.eval.weights import (
        RANDOM_INIT_STAMP_PREFIX,
        stamp_metric_log,
    )

    p = tmp_path / "fid.txt"
    p.write_text("1000 12.5 13.1 0.21 24.2\n")  # calibrated-era lines
    monkeypatch.delenv("CNG_INCEPTION_WEIGHTS", raising=False)
    monkeypatch.delenv("CNG_LPIPS_WEIGHTS", raising=False)
    stamp_metric_log(p)
    stamp_metric_log(p)  # idempotent
    lines = p.read_text().splitlines()
    assert lines[0].startswith("1000 ")  # original data intact
    stamps = [l for l in lines if l.startswith(RANDOM_INIT_STAMP_PREFIX)]
    assert len(stamps) == 1 and "FID/oFID" in stamps[0]
