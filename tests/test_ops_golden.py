"""Golden tests: ops layer vs the PyTorch reference implementation.

Random-dependent paths are made deterministic by patching torch's RNG entry
points with fixed tensors and feeding the same values to the JAX ops.
"""

from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

from conditioned_nerf_gan_tpu import ops

torch = pytest.importorskip("torch")

RTOL = 1e-5
ATOL = 1e-5


@pytest.fixture(scope="module")
def vr(reference_path):
    from generators import volumetric_rendering

    return volumetric_rendering


def allclose(j, t, rtol=RTOL, atol=ATOL):
    np.testing.assert_allclose(
        np.asarray(j), t.detach().cpu().numpy(), rtol=rtol, atol=atol
    )


@requires_reference
def test_get_initial_rays_matches(vr):
    B, S, W, H = 2, 12, 8, 8
    fov, rs, re = 49.134342641202636, 0.25, 1.95
    pts_t, z_t, dirs_t = vr.get_initial_rays_trig(
        B, S, device="cpu", fov=fov, resolution=(W, H), ray_start=rs, ray_end=re
    )
    pts_j, z_j, dirs_j = ops.get_initial_rays(B, S, fov, (W, H), rs, re)
    allclose(pts_j, pts_t)
    allclose(z_j, z_t)
    allclose(dirs_j, dirs_t)


@requires_reference
def test_perturb_and_transform_matches(vr):
    rng = np.random.default_rng(0)
    B, S, W, H = 2, 8, 4, 4
    pts_t, z_t, dirs_t = vr.get_initial_rays_trig(
        B, S, device="cpu", fov=30.0, resolution=(W, H), ray_start=0.7, ray_end=1.3
    )
    uniforms = rng.random(z_t.shape, dtype=np.float32)
    origins = rng.normal(size=(B, 3)).astype(np.float32)
    cam_t = vr.create_cam2world_matrix(torch.from_numpy(origins), "y", device="cpu")

    with mock.patch.object(
        vr.torch, "rand", lambda *a, **k: torch.from_numpy(uniforms)
    ):
        tp_t, tz_t, td_t, to_t = vr.transform_sampled_points(
            pts_t, z_t, dirs_t, device="cpu", cam2worlds=cam_t
        )

    pts_j, z_j, dirs_j = ops.get_initial_rays(B, S, 30.0, (W, H), 0.7, 1.3)
    pts_j, z_j = ops.perturb_points(pts_j, z_j, dirs_j, uniforms=jnp.asarray(uniforms))
    cam_j = ops.create_cam2world_matrix(jnp.asarray(origins), "y")
    allclose(cam_j, cam_t)
    tp_j, tz_j, td_j, to_j = ops.transform_rays(pts_j, z_j, dirs_j, cam_j)
    allclose(tp_j, tp_t, atol=1e-4)
    allclose(tz_j, tz_t)
    allclose(td_j, td_t)
    allclose(to_j, to_t)


@requires_reference
def test_sample_camera_positions_matches(vr):
    rng = np.random.default_rng(1)
    n = 64
    u = rng.random((n, 3))
    for up in ("y", "z"):
        with mock.patch.object(
            vr.np.random, "rand", side_effect=[u[:, 0], u[:, 1], u[:, 2]]
        ):
            cams_t = vr.sample_camera_positions(
                "cpu", up, cam_r_start=0.7, cam_r_end=1.5, n=n
            )
        cams_j = ops.sample_camera_positions(
            None, n, up_direction=up, cam_r_start=0.7, cam_r_end=1.5,
            uniforms=jnp.asarray(u, dtype=jnp.float32),
        )
        allclose(cams_j, cams_t, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("clamp_mode", ["relu", "softplus"])
@pytest.mark.parametrize("white_back,last_back", [(False, False), (True, False), (False, True)])
def test_volume_integrate_matches(vr, clamp_mode, white_back, last_back):
    rng = np.random.default_rng(2)
    B, R, S = 2, 16, 24
    rgb_sigma = rng.normal(size=(B, R, S, 4)).astype(np.float32)
    z = np.sort(rng.random((B, R, S, 1)).astype(np.float32), axis=2)
    noise = rng.normal(size=(B, R, S, 1)).astype(np.float32)
    noise_std = 0.5

    with mock.patch.object(
        vr.torch, "randn", lambda *a, **k: torch.from_numpy(noise)
    ):
        rgb_t, depth_t, w_t = vr.fancy_integration(
            torch.from_numpy(rgb_sigma), torch.from_numpy(z), device="cpu",
            noise_std=noise_std, last_back=last_back, white_back=white_back,
            clamp_mode=clamp_mode,
        )
    rgb_j, depth_j, w_j = ops.volume_integrate(
        jnp.asarray(rgb_sigma), jnp.asarray(z), noise_std=noise_std,
        noise=jnp.asarray(noise), last_back=last_back, white_back=white_back,
        clamp_mode=clamp_mode,
    )
    allclose(rgb_j, rgb_t, atol=1e-4)
    allclose(depth_j, depth_t, atol=1e-4)
    allclose(w_j, w_t, atol=1e-4)


@requires_reference
@pytest.mark.parametrize("det", [True, False])
def test_sample_pdf_matches(vr, det):
    rng = np.random.default_rng(3)
    R, S = 32, 46
    n_imp = 48
    bins = np.sort(rng.random((R, S + 1)).astype(np.float32), axis=1)
    weights = rng.random((R, S)).astype(np.float32)
    u = rng.random((R, n_imp)).astype(np.float32)

    with mock.patch.object(vr.torch, "rand", lambda *a, **k: torch.from_numpy(u)):
        samples_t = vr.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), n_imp, det=det
        )
    samples_j = ops.sample_pdf(
        jnp.asarray(bins), jnp.asarray(weights), n_imp, det=det,
        uniforms=None if det else jnp.asarray(u),
    )
    allclose(samples_j, samples_t, atol=1e-5)


@requires_reference
def test_merge_sorted_samples_matches(vr):
    rng = np.random.default_rng(4)
    B, R, S = 2, 8, 12
    fine = rng.normal(size=(B, R, S, 4)).astype(np.float32)
    coarse = rng.normal(size=(B, R, S, 4)).astype(np.float32)
    fz = rng.random((B, R, S, 1)).astype(np.float32)
    cz = rng.random((B, R, S, 1)).astype(np.float32)

    all_out_t = torch.cat([torch.from_numpy(fine), torch.from_numpy(coarse)], dim=-2)
    all_z_t = torch.cat([torch.from_numpy(fz), torch.from_numpy(cz)], dim=-2)
    _, idx = torch.sort(all_z_t, dim=-2)
    all_z_t = torch.gather(all_z_t, -2, idx)
    all_out_t = torch.gather(all_out_t, -2, idx.expand(-1, -1, -1, 4))

    out_j, z_j = ops.merge_sorted_samples(
        jnp.asarray(fine), jnp.asarray(fz), jnp.asarray(coarse), jnp.asarray(cz)
    )
    allclose(z_j, all_z_t)
    allclose(out_j, all_out_t)


@requires_reference
@pytest.mark.parametrize(
    "align_corners,padding_mode",
    [(False, "border"), (True, "zeros"), (False, "zeros"), (True, "border")],
)
def test_grid_sample_3d_matches_pytorch(align_corners, padding_mode):
    import torch.nn.functional as F

    rng = np.random.default_rng(5)
    B, C, D, H, W = 2, 6, 5, 7, 9
    vol = rng.normal(size=(B, C, D, H, W)).astype(np.float32)
    # include well out-of-range coords to exercise padding
    grid = (rng.random((B, 3, 4, 11, 3)).astype(np.float32) * 3.0) - 1.5

    out_t = F.grid_sample(
        torch.from_numpy(vol), torch.from_numpy(grid), mode="bilinear",
        align_corners=align_corners, padding_mode=padding_mode,
    )
    out_j = ops.grid_sample_3d(
        jnp.asarray(vol), jnp.asarray(grid),
        align_corners=align_corners, padding_mode=padding_mode,
    )
    allclose(out_j, out_t, atol=1e-5)


@requires_reference
def test_distance2depth_matches(vr):
    rng = np.random.default_rng(6)
    dist = rng.random((2, 16, 1)).astype(np.float32)
    rays = rng.normal(size=(2, 16, 3)).astype(np.float32)
    out_t = vr.distance2depth(torch.from_numpy(dist), torch.from_numpy(rays))
    out_j = ops.distance2depth(jnp.asarray(dist), jnp.asarray(rays))
    allclose(out_j, out_t)


def test_volume_integrate_analytic():
    """Opaque first sample → pixel color equals that sample's rgb, depth its z."""
    B, R, S = 1, 4, 8
    rgb = jnp.zeros((B, R, S, 3)).at[:, :, 0, :].set(jnp.array([0.2, 0.4, 0.6]))
    sigma = jnp.full((B, R, S, 1), -100.0).at[:, :, 0, :].set(1e9)
    z = jnp.broadcast_to(jnp.linspace(0.5, 1.5, S)[None, None, :, None], (B, R, S, 1))
    out_rgb, out_depth, w = ops.volume_integrate(
        jnp.concatenate([rgb, sigma], -1), z, clamp_mode="relu"
    )
    np.testing.assert_allclose(out_rgb, np.tile([0.2, 0.4, 0.6], (B, R, 1)), atol=1e-6)
    np.testing.assert_allclose(out_depth, np.full((B, R, 1), 0.5), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w).sum(2), np.ones((B, R, 1)), atol=1e-6)


def test_sample_pdf_det_concentrates_mass():
    """All weight in one bin → deterministic samples land inside that bin."""
    R, S = 4, 10
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, S + 1)[None], (R, S + 1))
    weights = jnp.zeros((R, S)).at[:, 3].set(1.0)
    samples = ops.sample_pdf(bins, weights, 16, det=True)
    s = np.asarray(samples)[:, 1:-1]  # endpoints may touch the bin edges
    assert (s >= 0.3 - 1e-4).all() and (s <= 0.4 + 1e-4).all()


def test_gather_strategies_agree():
    """Expanded-neighbor and block-gather border paths produce identical
    results (strategy choice is a pure perf decision)."""
    from conditioned_nerf_gan_tpu.ops.grid_sample import (
        _block_gather_border,
        _border_trilerp,
        _unnormalize,
    )

    key = jax.random.PRNGKey(0)
    vol = jax.random.normal(key, (2, 9, 7, 5, 6))
    coords = jax.random.uniform(
        jax.random.fold_in(key, 1), (2, 300, 3), minval=-1.3, maxval=1.3
    )
    D, H, W = 9, 7, 5
    fx = _unnormalize(coords[..., 0], W, False)
    fy = _unnormalize(coords[..., 1], H, False)
    fz = _unnormalize(coords[..., 2], D, False)
    a = _border_trilerp(vol, fx, fy, fz)
    b = _block_gather_border(vol, fx, fy, fz)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_merge_custom_vjp_matches_autodiff():
    """The gather-based merge backward equals XLA's native sort autodiff."""
    from conditioned_nerf_gan_tpu.ops.sampling import merge_sorted_samples

    key = jax.random.PRNGKey(0)
    B, R, S, C = 2, 5, 8, 4
    oa = jax.random.normal(key, (B, R, S, C))
    ob = jax.random.normal(jax.random.fold_in(key, 1), (B, R, S, C))
    za = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 2), (B, R, S, 1)), axis=-2)
    zb = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 3), (B, R, S, 1)), axis=-2)

    def loss_new(oa, ob):
        out, out_z = merge_sorted_samples(oa, za, ob, zb)
        return jnp.sum(out * jnp.cos(out_z))

    def loss_ref(oa, ob):
        allo = jnp.concatenate([oa, ob], axis=-2)
        allz = jnp.concatenate([za, zb], axis=-2)
        idx = jnp.argsort(allz[..., 0], axis=-1, stable=True)
        out = jnp.take_along_axis(allo, idx[..., None], axis=-2)
        out_z = jnp.take_along_axis(allz, idx[..., None], axis=-2)
        return jnp.sum(out * jnp.cos(out_z))

    va, (ga, gb) = jax.value_and_grad(loss_new, argnums=(0, 1))(oa, ob)
    vr, (ra, rb) = jax.value_and_grad(loss_ref, argnums=(0, 1))(oa, ob)
    np.testing.assert_allclose(float(va), float(vr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ra), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), atol=1e-6)


def test_merge_z_gradient_roundtrip():
    """z cotangents unsort correctly too (they flow into delta terms)."""
    from conditioned_nerf_gan_tpu.ops.sampling import merge_sorted_samples

    key = jax.random.PRNGKey(4)
    B, R, S, C = 1, 3, 6, 2
    oa = jax.random.normal(key, (B, R, S, C))
    ob = jax.random.normal(jax.random.fold_in(key, 1), (B, R, S, C))
    za = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 2), (B, R, S, 1)), axis=-2)
    zb = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 3), (B, R, S, 1)), axis=-2)

    def f(za_, zb_):
        out, out_z = merge_sorted_samples(oa, za_, ob, zb_)
        return jnp.sum(out_z ** 2 + out.sum(-1, keepdims=True) * out_z)

    def f_ref(za_, zb_):
        allo = jnp.concatenate([oa, ob], axis=-2)
        allz = jnp.concatenate([za_, zb_], axis=-2)
        idx = jnp.argsort(allz[..., 0], axis=-1, stable=True)
        out = jnp.take_along_axis(allo, idx[..., None], axis=-2)
        out_z = jnp.take_along_axis(allz, idx[..., None], axis=-2)
        return jnp.sum(out_z ** 2 + out.sum(-1, keepdims=True) * out_z)

    ga = jax.grad(f, argnums=(0, 1))(za, zb)
    gr = jax.grad(f_ref, argnums=(0, 1))(za, zb)
    for a, r in zip(ga, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-6)


def test_expanded_gather_custom_vjp():
    """The matmul-transpose backward equals XLA's scatter-based autodiff
    (checked against the block-gather path, which keeps native autodiff)."""
    from conditioned_nerf_gan_tpu.ops.grid_sample import (
        _block_gather_border,
        _border_trilerp,
        _unnormalize,
    )

    key = jax.random.PRNGKey(0)
    B, N, D, H, W, C = 2, 353, 6, 5, 4, 3
    vol = jax.random.normal(key, (B, D, H, W, C))
    coords = jax.random.uniform(
        jax.random.fold_in(key, 1), (B, N, 3), minval=-1.2, maxval=1.2
    )
    g_out = jax.random.normal(jax.random.fold_in(key, 2), (B, N, C))
    fx = _unnormalize(coords[..., 0], W, False)
    fy = _unnormalize(coords[..., 1], H, False)
    fz = _unnormalize(coords[..., 2], D, False)

    def loss_exp(vol, fx, fy, fz):
        return jnp.sum(_border_trilerp(vol, fx, fy, fz) * g_out)

    def loss_blk(vol, fx, fy, fz):
        return jnp.sum(_block_gather_border(vol, fx, fy, fz) * g_out)

    ge = jax.grad(loss_exp, argnums=(0, 1, 2, 3))(vol, fx, fy, fz)
    gb = jax.grad(loss_blk, argnums=(0, 1, 2, 3))(vol, fx, fy, fz)
    # bf16 transpose matmuls: tolerance at the bf16 noise floor
    np.testing.assert_allclose(np.asarray(ge[0]), np.asarray(gb[0]),
                               atol=0.05, rtol=0.02)
    # fp32 coordinate grads: tight
    for a, b in zip(ge[1:], gb[1:]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)
    # absolute check of the volume grad against a dense reference
    def dense_ref(vol):
        return jnp.sum(_block_gather_border(vol, fx, fy, fz) * g_out)

    gd = jax.grad(dense_ref)(vol)
    corr = np.corrcoef(np.asarray(ge[0]).ravel(), np.asarray(gd).ravel())[0, 1]
    assert corr > 0.999
