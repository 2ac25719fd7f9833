"""Metric computation: FID, oFID, LPIPS, PSNR.

Parity target: reference metric_utils.py —
  * FID over 2048-d pooled Inception features of whole directories
    (fid_evaluation.py:167-172 via pytorch_fid)
  * oFID: per-object FID over the 768-d 17×17 feature map flattened to
    17·17·B samples, ≥10 views/object, exact scipy sqrtm (NumpyExact) or
    Newton–Schulz approximation (metric_utils.py:45-139)
  * LPIPS (AlexNet) over [0,1]→[-1,1] images (metric_utils.py:259-267)
  * PSNR (metric_utils.py:245-256)
  * directory-pair driver keyed by `{car}_{i:04}.png` names against the val
    car list (metric_utils.py:270-332)
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def _cov(feat: np.ndarray) -> np.ndarray:
    """Sample covariance over rows (metric_utils.py:91-119)."""
    return np.cov(feat, rowvar=False)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Exact Frechet distance with scipy sqrtm (metric_utils.py:144-203)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def newton_schulz_sqrt_trace(a: jnp.ndarray, num_iters: int = 50) -> jnp.ndarray:
    """trace(sqrtm(A)) via Newton–Schulz (metric_utils.py:124-139), on-device."""
    dim = a.shape[-1]
    norm_a = jnp.sqrt(jnp.sum(a * a))
    y = a / norm_a
    eye = jnp.eye(dim, dtype=a.dtype)
    z = jnp.eye(dim, dtype=a.dtype)

    def body(_, carry):
        y, z = carry
        t = 0.5 * (3.0 * eye - z @ y)
        return y @ t, t @ z

    y, z = jax.lax.fori_loop(0, num_iters, body, (y, z))
    return jnp.trace(y * jnp.sqrt(norm_a))


def compute_psnr(a: np.ndarray, b: np.ndarray, max_val: float = 1.0) -> float:
    """Mean per-image PSNR over a batch (metric_utils.py:245-256)."""
    mse = ((a - b) ** 2).reshape(a.shape[0], -1).mean(axis=1)
    psnr = 20 * np.log10(max_val) - 10 * np.log10(mse)
    return float(psnr.mean())


def _load_dir_images(path: str | Path, batch: int = 64):
    """Yield (B, H, W, 3) float[0,1] batches over all pngs in a directory."""
    import cv2

    files = sorted(Path(path).glob("*.png"))
    for i in range(0, len(files), batch):
        imgs = []
        for f in files[i : i + batch]:
            img = cv2.imread(str(f), cv2.IMREAD_COLOR)[..., ::-1]
            imgs.append(img.astype(np.float32) / 255.0)
        yield np.stack(imgs)


def _inception_features(imgs: np.ndarray):
    from .inception import get_inception

    model, params = get_inception()
    fn = _inception_features._fn
    if fn is None:
        fn = jax.jit(lambda p, x: model.apply(p, x))
        _inception_features._fn = fn
    f768, f2048 = fn(params, jnp.asarray(imgs))
    return np.asarray(f768), np.asarray(f2048)


_inception_features._fn = None


def compute_fid_from_dirs(real_dir, gen_dir, batch: int = 64) -> float:
    """Directory-level FID over 2048-d features (fid_evaluation.py:167-172)."""
    feats = []
    for d in (real_dir, gen_dir):
        chunks = [f2048 for _, f2048 in map(
            lambda b: _inception_features(b), _load_dir_images(d, batch)
        )]
        feats.append(np.concatenate(chunks))
    mu1, s1 = feats[0].mean(0), _cov(feats[0])
    mu2, s2 = feats[1].mean(0), _cov(feats[1])
    return frechet_distance(mu1, s1, mu2, s2)


def compute_ofid_from_batch(img_gt: np.ndarray, img_pred: np.ndarray,
                            exact: bool = True) -> float:
    """Per-object FID over 768-d features (metric_utils.py:45-77).

    img_*: (B, H, W, 3) in [0,1], same object, B >= 10.
    """
    if img_gt.shape[0] < 10:
        raise RuntimeError(
            f"Need at least 10 views per object for a stable oFID "
            f"(got {img_gt.shape[0]})"
        )
    f_gt, _ = _inception_features(img_gt)
    f_pr, _ = _inception_features(img_pred)
    f_gt = f_gt.reshape(-1, f_gt.shape[-1])  # (17*17*B, 768)
    f_pr = f_pr.reshape(-1, f_pr.shape[-1])
    mu1, s1 = f_gt.mean(0), _cov(f_gt)
    mu2, s2 = f_pr.mean(0), _cov(f_pr)
    if exact:
        return frechet_distance(mu1, s1, mu2, s2)
    diff = mu1 - mu2
    tr = float(newton_schulz_sqrt_trace(jnp.asarray(s1 @ s2)))
    return float(diff.dot(diff) + np.trace(s1) + np.trace(s2) - 2 * tr)


def compute_lpips_batch(a: np.ndarray, b: np.ndarray) -> float:
    """LPIPS over [0,1] image batches (metric_utils.py:259-267)."""
    from .lpips import get_lpips

    model, params = get_lpips()
    fn = compute_lpips_batch._fn
    if fn is None:
        fn = jax.jit(lambda p, x, y: model.apply(p, x, y))
        compute_lpips_batch._fn = fn
    dist = fn(params, jnp.asarray(a) * 2 - 1, jnp.asarray(b) * 2 - 1)
    return float(np.asarray(dist).mean())


compute_lpips_batch._fn = None


def compute_metrics_from_dirs(
    real_dir: str | Path,
    gen_dir: str | Path,
    car_lst: str | Path,
    views_per_car: int = 24,
    exact_ofid: bool = True,
):
    """(fid, ofid, lpips, psnr) over paired `{car}_{i:04}.png` directories
    (metric_utils.py:270-332)."""
    import cv2

    with open(car_lst) as f:
        cars = [line.strip() for line in f if line.strip()]

    ofid_ls, lpips_ls, psnr_ls = [], [], []
    for car in cars:
        reals, gens = [], []
        for i in range(views_per_car):
            rp = Path(real_dir) / f"{car}_{i:04}.png"
            gp = Path(gen_dir) / f"{car}_{i:04}.png"
            if not (rp.exists() and gp.exists()):
                continue
            reals.append(cv2.imread(str(rp), cv2.IMREAD_COLOR)[..., ::-1] / 255.0)
            gens.append(cv2.imread(str(gp), cv2.IMREAD_COLOR)[..., ::-1] / 255.0)
        if not reals:
            continue
        img_real = np.stack(reals).astype(np.float32)
        img_gen = np.stack(gens).astype(np.float32)
        if img_real.shape[0] >= 10:
            ofid_ls.append(compute_ofid_from_batch(img_real, img_gen, exact_ofid))
        lpips_ls.append(compute_lpips_batch(img_real, img_gen))
        psnr_ls.append(compute_psnr(img_real, img_gen))

    fid = compute_fid_from_dirs(real_dir, gen_dir)
    ofid = float(np.mean(ofid_ls)) if ofid_ls else float("nan")
    lpips_score = float(np.mean(lpips_ls)) if lpips_ls else float("nan")
    psnr = float(np.mean(psnr_ls)) if psnr_ls else float("nan")
    return fid, ofid, lpips_score, psnr
