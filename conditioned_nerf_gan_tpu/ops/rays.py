"""Camera / ray generation primitives.

Parity targets (behavioral, not line-for-line):
  - ray grid + stratified z:   reference generators/volumetric_rendering.py:73-110
  - world-space transform:     reference generators/volumetric_rendering.py:113-199
  - spherical camera sampling: reference generators/volumetric_rendering.py:212-238
  - look-at cam2world:         reference generators/volumetric_rendering.py:255-287
  - distance→depth projection: reference generators/volumetric_rendering.py:345-356

Design notes (TPU-first):
  * Everything is shape-static given (W, H, num_steps); batch enters only via
    the cam2world matrix, so the per-pixel grid is computed once and broadcast.
  * The homogeneous 4x4 transform is a single einsum (MXU-friendly); no
    torch.bmm/permute chains.
  * Randomness is functional: callers pass a `jax.random` key (or pre-drawn
    uniforms for golden testing) instead of relying on global RNG state.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def normalize_vecs(v: jax.Array, axis: int = -1, eps: float = 0.0) -> jax.Array:
    """Unit-normalize along `axis` (reference generators/math_utils_torch.py)."""
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        norm = jnp.maximum(norm, eps)
    return v / norm


def pixel_rays(fov, width: int, height: int, dtype=jnp.float32,
               row_offset=None, full_height: int | None = None) -> jax.Array:
    """Per-pixel unit ray directions in camera space, shape (W*H, 3).

    Pixel (row j, col i) maps to flat index j*W + i with
    x = linspace(-1,1,W)[i], y = linspace(-1,1,H)[j], z = 1/tan(fov/2)
    (fov in degrees) — matching the meshgrid/transpose convention of the
    reference (volumetric_rendering.py:77-88). `fov` may be a traced scalar
    (per-frame fov sweeps, e.g. orbit videos, don't recompile).

    `row_offset`/`full_height` render a horizontal slab of a larger image:
    rows [row_offset, row_offset+height) of a full_height-tall pixel grid
    (row_offset may be traced — this is how the ray axis shards over a
    device mesh without per-device recompiles, parallel/render.py).
    """
    x = jnp.linspace(-1.0, 1.0, width, dtype=dtype)
    if row_offset is not None:
        fh = full_height if full_height is not None else height
        rows = row_offset + jnp.arange(height, dtype=dtype)
        y = rows * (2.0 / (fh - 1)) - 1.0
    else:
        y = jnp.linspace(-1.0, 1.0, height, dtype=dtype)
    xx = jnp.tile(x[None, :], (height, 1)).reshape(-1)
    yy = jnp.tile(y[:, None], (1, width)).reshape(-1)
    fov_arr = jnp.asarray(fov)
    inv_tan = 1.0 / jnp.tan(fov_arr * (math.pi / 360.0))
    if fov_arr.ndim == 0:
        z = jnp.broadcast_to(inv_tan, xx.shape).astype(dtype)
        return normalize_vecs(jnp.stack([xx, yy, z], axis=-1))
    # batched fov (B,): per-image focal lengths in one dispatch (orbit-video
    # fov sweeps render whole frame blocks at once) → (B, W*H, 3)
    B = fov_arr.shape[0]
    n = xx.shape[0]
    xxb = jnp.broadcast_to(xx[None], (B, n))
    yyb = jnp.broadcast_to(yy[None], (B, n))
    zb = jnp.broadcast_to(inv_tan[:, None], (B, n)).astype(dtype)
    return normalize_vecs(jnp.stack([xxb, yyb, zb], axis=-1))


def get_initial_rays(
    batch_size: int,
    num_steps: int,
    fov,
    resolution: tuple[int, int],
    ray_start: float,
    ray_end: float,
    dtype=jnp.float32,
    row_offset=None,
    full_height: int | None = None,
):
    """Stratified sample points along each pixel ray in camera space.

    Returns:
      points:     (B, W*H, S, 3) camera-space sample points (t * d)
      z_vals:     (B, W*H, S, 1) sample depths (uniform linspace, unperturbed)
      rays_d_cam: (B, W*H, 3)    unit ray directions in camera space
    """
    width, height = resolution
    rays_d = pixel_rays(fov, width, height, dtype,
                        row_offset=row_offset, full_height=full_height)
    z_vals = jnp.linspace(ray_start, ray_end, num_steps, dtype=dtype)
    z_vals = jnp.broadcast_to(z_vals[None, :, None], (width * height, num_steps, 1))
    if rays_d.ndim == 3:  # batched per-image fov: rays_d is (B, WH, 3)
        points = rays_d[:, :, None, :] * z_vals[None]  # (B, WH, S, 3)
    else:
        points = rays_d[:, None, :] * z_vals  # (WH, S, 3)
        points = jnp.broadcast_to(points[None], (batch_size, *points.shape))
        rays_d = jnp.broadcast_to(rays_d[None], (batch_size, *rays_d.shape))
    z_vals = jnp.broadcast_to(z_vals[None], (batch_size, *z_vals.shape))
    return points, z_vals, rays_d


def perturb_points(
    points: jax.Array,
    z_vals: jax.Array,
    rays_d: jax.Array,
    *,
    key: jax.Array | None = None,
    uniforms: jax.Array | None = None,
):
    """Jitter each sample within its stratum (volumetric_rendering.py:103-110).

    offset = (U - 0.5) * (z1 - z0), applied to both z_vals and points.
    Pass `uniforms` (same shape as z_vals) to inject fixed noise for parity
    tests; otherwise a PRNG `key` must be given.
    """
    if uniforms is None:
        if key is None:
            raise ValueError("perturb_points needs a PRNG key or explicit uniforms")
        uniforms = jax.random.uniform(key, z_vals.shape, dtype=z_vals.dtype)
    spacing = z_vals[:, :, 1:2, :] - z_vals[:, :, 0:1, :]
    offset = (uniforms - 0.5) * spacing
    z_vals = z_vals + offset
    points = points + offset * rays_d[:, :, None, :]
    return points, z_vals


def transform_rays(points: jax.Array, z_vals: jax.Array, rays_d: jax.Array,
                   cam2world: jax.Array):
    """Map camera-space sample points / ray dirs / origins into world space.

    Args:
      points:    (B, R, S, 3) perturbed camera-space points
      z_vals:    (B, R, S, 1)
      rays_d:    (B, R, 3) camera-space unit ray dirs
      cam2world: (B, 4, 4)
    Returns (world_points (B,R,S,3), z_vals, world_dirs (B,R,3), origins (B,R,3)).

    Equivalent to volumetric_rendering.py:113-199 but as two einsums instead of
    bmm/permute chains; the homogeneous coordinate is folded in as a (+ t)
    translation term, avoiding the materialized ones-column.
    """
    rot = cam2world[:, :3, :3]  # (B,3,3)
    t = cam2world[:, :3, 3]  # (B,3)
    # Geometry matmuls are tiny (3x3) but precision-critical: pin full fp32
    # accumulation rather than the backend's default (bf16 passes on TPU).
    hi = jax.lax.Precision.HIGHEST
    world_points = (
        jnp.einsum("bij,brsj->brsi", rot, points, precision=hi)
        + t[:, None, None, :]
    )
    world_dirs = jnp.einsum("bij,brj->bri", rot, rays_d, precision=hi)
    origins = jnp.broadcast_to(t[:, None, :], world_dirs.shape)
    return world_points, z_vals, world_dirs, origins


def sample_camera_positions(
    key: jax.Array,
    n: int,
    *,
    up_direction: str = "y",
    cam_r_start: float = 0.0,
    cam_r_end: float = 1.0,
    uniforms: jax.Array | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Sample n camera origins uniformly over a half-sphere shell.

    theta = arccos(1 - u) (uniform over the upper hemisphere), phi ~ U(0, 2pi),
    r ~ U(r_start, r_end) — reference volumetric_rendering.py:212-238.
    `uniforms` (n, 3) may be supplied for deterministic parity tests.
    """
    if up_direction not in ("y", "z"):
        raise ValueError("up_direction must be 'y' or 'z'")
    if uniforms is None:
        uniforms = jax.random.uniform(key, (n, 3), dtype=dtype)
    theta = jnp.arccos(1.0 - uniforms[:, 0])
    theta = jnp.clip(theta, 1e-5, math.pi - 1e-5)
    phi = uniforms[:, 1] * 2.0 * math.pi
    r = uniforms[:, 2] * (cam_r_end - cam_r_start) + cam_r_start

    x = r * jnp.sin(theta) * jnp.cos(phi)
    lateral = r * jnp.sin(theta) * jnp.sin(phi)
    vertical = r * jnp.cos(theta)
    if up_direction == "z":
        return jnp.stack([x, lateral, vertical], axis=-1)
    return jnp.stack([x, vertical, lateral], axis=-1)


def create_cam2world_matrix(origin: jax.Array, up_direction: str = "y") -> jax.Array:
    """Look-at-the-world-origin cam2world matrices, (B, 4, 4).

    forward = normalize(-origin); left = normalize(up x forward);
    true_up = normalize(forward x left); R columns = (-left, -true_up, forward);
    translation = origin. Reference volumetric_rendering.py:255-287.
    """
    if up_direction not in ("y", "z"):
        raise ValueError("up_direction must be 'y' or 'z'")
    forward = normalize_vecs(-origin)
    up = jnp.zeros_like(forward)
    up = up.at[:, 1 if up_direction == "y" else 2].set(1.0)
    left = normalize_vecs(jnp.cross(up, forward))
    true_up = normalize_vecs(jnp.cross(forward, left))

    rot = jnp.stack([-left, -true_up, forward], axis=-1)  # (B, 3, 3), columns
    batch = origin.shape[0]
    mat = jnp.broadcast_to(jnp.eye(4, dtype=origin.dtype), (batch, 4, 4))
    mat = mat.at[:, :3, :3].set(rot)
    mat = mat.at[:, :3, 3].set(origin)
    return mat


def create_world2cam_matrix(origin: jax.Array,
                            up_direction: str = "y") -> jax.Array:
    """Inverse look-at matrix (reference volumetric_rendering.py:290-294)."""
    return jnp.linalg.inv(create_cam2world_matrix(origin, up_direction))


def xyz2angles(xyz: jax.Array):
    """(phi, theta) angles of points (reference volumetric_rendering.py:241-252,
    including its use of the *unnormalized* x in the theta term)."""
    normalized = normalize_vecs(xyz)
    phi = jnp.arccos(normalized[:, -1])
    theta = jnp.arccos(xyz[:, 0] / jnp.sqrt(1.0 - xyz[:, -1] * 2.0))
    return phi[:, None], theta[:, None]


def distance2depth(distance: jax.Array, rays_d_cam: jax.Array) -> jax.Array:
    """Project ray-distance to camera-z depth: depth = d * dir_z.

    Reference volumetric_rendering.py:345-356 (note: uses the *camera-space*
    ray direction's z component).
    """
    return rays_d_cam[..., -1:] * distance
