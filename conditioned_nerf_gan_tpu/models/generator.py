"""Generator composition: conditioning latent + camera -> rendered image.

Parity target: reference generators/generators.py:9-187 (`ImplicitGenerator3d`)
— ray generation under no_grad (here: stop_gradient), coarse SIREN eval,
optional hierarchical fine resampling (weights/fine-point selection detached),
sort-merge, final integration, pixels scaled to [-1, 1], z-depth map.

TPU-first differences:
  * Pure function of (params, z, cam2world, rng, RenderConfig); every option
    that affects shapes or control flow lives in the hashable RenderConfig so
    each curriculum stage is one compiled XLA program.
  * Images are NHWC (TPU conv layout) instead of NCHW.
  * `nerf_noise` and `fov` are *traced* scalars — per-step noise decay
    (utils.py:618) and per-frame fov sweeps don't recompile.
  * `ray_chunks > 1` renders the per-ray pipeline in rematerialized chunks
    (lax.map + jax.checkpoint over the ray axis): activation memory scales
    with the chunk instead of the image, the mathematically clean
    alternative to the reference's `batch_split` gradient accumulation
    (utils.py:638-711) — the discriminator still sees full images and the
    generator gradient is the true full-batch gradient.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from flax import linen as nn

from ..ops import (
    distance2depth,
    get_initial_rays,
    merge_sorted_samples,
    perturb_points,
    sample_pdf,
    transform_rays,
    volume_integrate,
)
from .siren import make_siren


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering options (hashable; one jit cache entry per config)."""

    img_size: int = 64
    num_steps: int = 48
    fov: float = 30.0
    ray_start: float = 0.7
    ray_end: float = 1.3
    hierarchical_sample: bool = True
    clamp_mode: str = "relu"
    white_back: bool = False
    last_back: bool = False
    fill_mode: str | None = None
    perturb: bool = True
    ray_chunks: int = 0  # >1: rematerialized ray-chunked rendering
    # static density-noise gate: nerf_noise is a *traced* scalar (no
    # recompile as it decays), but the reference schedule is exactly 0 from
    # step 5000 on (utils.py:618) — stages past that pay threefry + a ×0
    # multiply per integrate for nothing. The trainer clears this per stage
    # when the schedule has hit zero; stratified-perturbation and stochastic
    # fine sampling are unaffected (they follow rng presence, as in the
    # reference).
    density_noise: bool = True
    # save the two SIREN eval outputs (B,R,S,4 rgb_sigma each) across the
    # ray-chunk remat instead of replaying the eval kernels in the backward:
    # the fused-VJP kernel's backward only needs its *inputs* (recomputed
    # cheaply from the ray math), so the forward replay exists purely to
    # rebuild rgb_sigma for the merge/integration backward. Measured NEUTRAL
    # at stage 2 (A/B/A 0.697/0.706/0.731 s/step): the ~300 MB of saved
    # residual HBM traffic cancels the ~70 ms of skipped kernel replay.
    # Kept as a tested dead lever (grads bit-identical, see
    # tests/test_train.py::test_save_siren_outputs_grad_parity); default off.
    save_siren_outputs: bool = False

    @classmethod
    def from_metadata(cls, metadata: dict, **overrides) -> "RenderConfig":
        """Build from a curriculum metadata dict (ignores unrelated keys)."""
        fields = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in metadata.items() if k in fields}
        kwargs.update(overrides)
        return cls(**kwargs)


class ImplicitGenerator3d(nn.Module):
    """NeRF generator wrapping a SIREN decoder (reference generators.py:9-25).

    Construct via siren kwargs matching the curriculum's `generator` block:
    siren_type, z_dim, input_dim, output_dim, hidden_dim, drop_out.
    """

    siren_type: str = "SHORTSIREN"
    z_dim: int = 512
    input_dim: int = 3
    output_dim: int = 4
    hidden_dim: int = 256
    drop_out: float = 0.0
    mapping_network: str = "CustomMappingNetwork"
    compute_dtype: Any = None  # bf16 SIREN matmul policy (fp32 params/sin)
    use_fast_sin: bool = False  # polynomial sin (ops/fastmath.py, ~3e-6 err)
    use_pallas: bool = False  # fused FiLM-SIREN point-eval kernel

    def setup(self):
        self.siren = make_siren(
            self.siren_type,
            z_dim=self.z_dim,
            input_dim=self.input_dim,
            output_dim=self.output_dim,
            hidden_dim=self.hidden_dim,
            drop_out=self.drop_out,
            mapping_network=self.mapping_network,
            compute_dtype=self.compute_dtype,
            use_fast_sin=self.use_fast_sin,
            use_pallas=self.use_pallas,
        )

    def eval_points(self, points: jax.Array, z: Any) -> jax.Array:
        """Raw SIREN field evaluation at world points → (B, N, 4) rgb+sigma.

        Used by shape extraction (reference extract_shapes.py:63-68 accesses
        generator.siren directly); call via
        `generator.apply(params, pts, z, method="eval_points")`.
        """
        return self.siren(points, z)

    # ------------------------------------------------------------------
    def _ray_pipeline(self, siren_fn, z, points, z_vals, rays_d_world,
                      origins, keys, config: RenderConfig, nerf_noise,
                      use_noise: bool):
        """Full per-ray pipeline: SIREN evals + hierarchical resample +
        integrate. points (B, R, S, 3) → pixels (B, R, 3), distances (B, R, 1).
        """
        B, R, S, _ = points.shape
        k_fine, k_noise1, k_noise2 = keys

        coarse_output = siren_fn(points.reshape(B, R * S, 3), z).reshape(
            B, R, S, 4
        )
        if config.save_siren_outputs:
            coarse_output = jax.ad_checkpoint.checkpoint_name(
                coarse_output, "siren_outputs"
            )

        use_dnoise = use_noise and config.density_noise
        if config.hierarchical_sample:
            # importance resampling, fully detached (generators.py:111-152)
            def fine_points_fn(coarse_output, z_vals):
                _, _, weights = volume_integrate(
                    coarse_output, z_vals,
                    noise_std=nerf_noise if use_dnoise else 0.0,
                    key=k_noise1 if use_dnoise else None,
                    clamp_mode=config.clamp_mode,
                )
                weights = weights.reshape(B * R, S) + 1e-5
                z_flat = z_vals.reshape(B * R, S)
                z_mid = 0.5 * (z_flat[:, :-1] + z_flat[:, 1:])
                fine_z = sample_pdf(
                    z_mid, weights[:, 1:-1], S,
                    det=not use_noise, key=k_fine,
                ).reshape(B, R, S, 1)
                fine_pts = (
                    origins[:, :, None, :]
                    + rays_d_world[:, :, None, :] * fine_z
                )
                return fine_pts.reshape(B, R * S, 3), fine_z

            fine_points, fine_z = jax.lax.stop_gradient(
                fine_points_fn(coarse_output, z_vals)
            )
            # Name the (gradient-free, small) fine sample positions so the
            # ray-chunk remat policy can SAVE them instead of re-running the
            # whole importance-sampling subgraph (integrate-for-weights +
            # sample_pdf's dense masks) during the backward pass.
            fine_points = jax.ad_checkpoint.checkpoint_name(
                fine_points, "fine_samples"
            )
            fine_z = jax.ad_checkpoint.checkpoint_name(fine_z, "fine_samples")
            fine_output = siren_fn(fine_points, z).reshape(B, R, S, 4)
            if config.save_siren_outputs:
                fine_output = jax.ad_checkpoint.checkpoint_name(
                    fine_output, "siren_outputs"
                )
            all_outputs, all_z = merge_sorted_samples(
                fine_output, fine_z, coarse_output, z_vals
            )
        else:
            all_outputs, all_z = coarse_output, z_vals

        pixels, distances, _ = volume_integrate(
            all_outputs, all_z,
            noise_std=nerf_noise if use_dnoise else 0.0,
            key=k_noise2 if use_dnoise else None,
            white_back=config.white_back,
            last_back=config.last_back,
            clamp_mode=config.clamp_mode,
            fill_mode=config.fill_mode,
        )
        return pixels, distances

    def __call__(
        self,
        z: Any,
        cam2world: jax.Array,
        config: RenderConfig,
        *,
        rng: jax.Array | None = None,
        nerf_noise: jax.Array | float = 0.0,
        deterministic: bool = True,
        fov: jax.Array | float | None = None,
        row_offset: jax.Array | int | None = None,
        render_rows: int | None = None,
    ):
        """Render a batch of images.

        Args:
          z: conditioning — latent (B, z_dim), feature volume (B,D,H,W,C) or a
             (volume/pyramid, global) tuple depending on siren_type
          cam2world: (B, 4, 4)
          config: static RenderConfig
          rng: PRNG key for stratified perturbation / fine sampling / density
               noise (None → deterministic rendering, matching eval overrides)
          nerf_noise: density-noise stddev (traced scalar ok)
          fov: optional traced fov override (orbit-video sweeps)
          row_offset/render_rows: render only rows
             [row_offset, row_offset+render_rows) of the img_size-tall pixel
             grid (row_offset may be traced) — the ray-axis sharding hook
             used by parallel/render.py to split one image over a mesh
        Returns:
          pixels (B, H, W, 3) in [-1, 1]; depth (B, H, W) z-depth map
          (H = render_rows when a row slab is requested).
        """
        B = cam2world.shape[0]
        S = config.num_steps
        W = H = config.img_size
        if render_rows is not None:
            H = render_rows
            if row_offset is None:
                # a row slab without an explicit offset means rows [0, H) —
                # without this, pixel_rays would silently squash the full
                # vertical fov into the slab
                row_offset = 0
        use_noise = rng is not None

        if rng is None:
            rng = jax.random.PRNGKey(0)
        k_perturb, k_fine, k_noise1, k_noise2 = jax.random.split(rng, 4)

        # --- ray generation (no grad through geometry, generators.py:57) ---
        points, z_vals, rays_d_cam = get_initial_rays(
            B, S, config.fov if fov is None else fov, (W, H),
            config.ray_start, config.ray_end,
            row_offset=row_offset, full_height=config.img_size,
        )
        if config.perturb and use_noise:
            points, z_vals = perturb_points(points, z_vals, rays_d_cam, key=k_perturb)
        points, z_vals, rays_d_world, origins = transform_rays(
            points, z_vals, rays_d_cam, cam2world
        )
        points = jax.lax.stop_gradient(points)
        z_vals = jax.lax.stop_gradient(z_vals)
        rays_d_world = jax.lax.stop_gradient(rays_d_world)
        origins = jax.lax.stop_gradient(origins)

        chunks = config.ray_chunks
        if self.is_initializing() and chunks > 1:
            # init only creates params; don't execute the full-size render
            self.siren(points.reshape(B, -1, 3)[:, : S], z)
            return jnp.zeros((B, H, W, 3)), jnp.zeros((B, H, W))
        if chunks > 1:
            # Rematerialized ray-chunked rendering: the whole per-ray pipeline
            # runs chunk by chunk under jax.checkpoint, so backward-pass
            # activation memory is bounded by the chunk size. self.siren is
            # invoked as a *pure* function of its bound variables (lifting a
            # module call through lax.map is not needed).
            siren_vars = self.siren.variables

            def siren_fn(pts, zz):
                return self.siren.apply(siren_vars, pts, zz)

            R = W * H
            assert R % chunks == 0, "ray_chunks must divide img_size²"
            r = R // chunks

            def reshape_chunks(x):
                return x.reshape(B, chunks, r, *x.shape[2:]).swapaxes(0, 1)

            pts_c = reshape_chunks(points)
            zv_c = reshape_chunks(z_vals)
            dirs_c = reshape_chunks(rays_d_world)
            orig_c = reshape_chunks(origins)
            keys = jnp.stack([
                jax.vmap(lambda i: jax.random.fold_in(k, i))(jnp.arange(chunks))
                for k in (k_fine, k_noise1, k_noise2)
            ], axis=1)  # (chunks, 3, 2)

            saved_names = ("fine_samples",)
            if config.save_siren_outputs:
                saved_names += ("siren_outputs",)

            @functools.partial(
                jax.checkpoint,
                policy=jax.checkpoint_policies.save_only_these_names(
                    *saved_names
                ),
            )
            def chunk_fn(operands):
                pts, zv, dirs, orig, ks = operands
                return self._ray_pipeline(
                    siren_fn, z, pts, zv, dirs, orig,
                    (ks[0], ks[1], ks[2]), config, nerf_noise, use_noise,
                )

            pixels_c, dist_c = jax.lax.map(
                chunk_fn, (pts_c, zv_c, dirs_c, orig_c, keys)
            )
            pixels = pixels_c.swapaxes(0, 1).reshape(B, R, 3)
            distances = dist_c.swapaxes(0, 1).reshape(B, R, 1)
        else:
            if self.is_initializing():
                # param creation only needs one tiny siren eval
                self.siren(points.reshape(B, -1, 3)[:, : S], z)
            pixels, distances = self._ray_pipeline(
                lambda pts, zz: self.siren(
                    pts, zz, deterministic=deterministic
                ),
                z, points, z_vals, rays_d_world, origins,
                (k_fine, k_noise1, k_noise2), config, nerf_noise, use_noise,
            )

        pixels = pixels.reshape(B, H, W, 3) * 2.0 - 1.0
        depth = distance2depth(distances, rays_d_cam).reshape(B, H, W)
        return pixels, depth


def generate_avg_frequencies(generator: ImplicitGenerator3d, params, key,
                             n_samples: int = 10000):
    """Average mapping-network frequencies/phases over random latents — the
    truncation-trick statistic (reference generators.py:189-197; meaningful
    for latent-conditioned sirens with a mapping network).
    """
    from .layers import LinearMapping, PointFeaturesMappingNetwork
    from .siren import SIREN_SPECS, _MAPPINGS

    spec = SIREN_SPECS.get(generator.siren_type)
    if spec is None or spec.mapping is None:
        raise ValueError(f"{generator.siren_type} has no mapping network")
    z = jax.random.normal(key, (n_samples, generator.z_dim))
    out_dim = len(spec.layers) * generator.hidden_dim * 2
    if spec.mapping == "linear":
        mapping = LinearMapping(out_dim)
    elif spec.mapping == "pointfeat":
        mapping = PointFeaturesMappingNetwork(hidden_dim=256, output_dim=out_dim)
    else:
        mapping = _MAPPINGS[generator.mapping_network](
            hidden_dim=256, output_dim=out_dim
        )
    sub = params["params"]["siren"]["mapping_network"]
    freq, phase = mapping.apply({"params": sub}, z)
    return freq.mean(0, keepdims=True), phase.mean(0, keepdims=True)
