"""Conditioned FiLM-SIREN NeRF decoders — the full variant matrix.

The reference implements 14 near-identical classes (generators/siren.py:232-1441)
differing only in (a) where the first-layer input comes from, (b) where the
FiLM conditioning comes from, (c) layer stack, (d) init frequency and (e)
output activation. Here that collapses into one generic `ConditionedSiren`
module driven by a `SirenSpec` table; every reference class name resolves via
`SIREN_REGISTRY` / `make_siren` so curriculum configs remain compatible
(`metadata["generator"]["siren_type"]`, cf. reference generators/generators.py:15).

Variant parity map (reference file:line → spec):
  TALLSIREN           siren.py:232   points input, per-point mapping on features
  TALLSIREN_dRes      siren.py:333   features input, [siren,res,res,siren], no FiLM
  TALLSIREN_dResLong  siren.py:411   features input, [siren,res×4,siren]
  TALLSIREN_FG        siren.py:491   features input, linear mapping on global, 8 FiLM
  SHORTSIREN_FG       siren.py:583   … 4 FiLM, freq-init 12
  SHORTSIREN_FG_Pyrmd siren.py:671   pyramid features input
  DOUBLESIREN_FG      siren.py:744   2 FiLM
  SHORTSIREN_F        siren.py:830   features input, 4 plain siren layers
  SHORTSIREN_FRes     siren.py:906   [siren,res,siren]
  SingleSIREN_dg      siren.py:983   1 FiLM, raw output
  TALLSIREN_dgx       siren.py:1068  features⊕points input, 8 FiLM, raw
  SHORTSIREN          siren.py:1172  global-z conditioning (PointNet path, thesis default)
  SPATIALSIRENBASELINE siren.py:1254 unconditional pi-GAN w/ view-dependent color head
  EmbeddingPiGAN128/256 siren.py:1359/1438 learned embedding cube variants

The sampled-feature lookup normalizes points by (voxel_length/2)=0.6 and uses
border-padded, align_corners=False trilinear interpolation exactly as
reference siren.py:299-311; volumes are NDHWC on TPU.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.grid_sample import trilinear_point_features
from .layers import (
    CustomMappingNetwork,
    FiLMLayer,
    LinearMapping,
    LongMappingNetwork,
    PointFeaturesMappingNetwork,
    ResSirenBlock,
    SirenLayer,
    TorchLinear,
    first_layer_film_sine_init,
    frequency_init,
)

VOXEL_LENGTH = 1.2  # the voxel grids are sampled within a 1.2³ cube


def sigmoid_rgb(rgb_sigma: jax.Array) -> jax.Array:
    """Sigmoid on rgb channels only (reference siren.py:1227-1234)."""
    rgb = jax.nn.sigmoid(rgb_sigma[..., :3])
    return jnp.concatenate([rgb, rgb_sigma[..., -1:]], axis=-1)


def sample_volume_features(points: jax.Array, volume: jax.Array) -> jax.Array:
    """Trilinear lookup of per-point features from an NDHWC feature volume.

    points: (B, N, 3) world coordinates inside the ±0.6 cube.
    volume: (B, D, H, W, C).
    """
    coords = points / (VOXEL_LENGTH / 2.0)
    return trilinear_point_features(
        volume, coords, align_corners=False, padding_mode="border"
    )


def sample_pyramid_features(points: jax.Array, pyramid) -> jax.Array:
    """Concat trilinear features over pyramid levels (reference siren.py:1444-1473).

    Accepts a single volume too (the reference's list-or-not branch at
    :1453-1454), so any features-input variant can consume a PyramidUNet3D
    encoder — the doublesiren_dis_featurepyramid experiment wires
    DOUBLESIREN (input_dim 224 = 128+64+32 pyramid concat) to the pyramid
    encoder (reference configs/thousand/direct_volume/dg.py:77-80; its stale
    class name never ran post-rename upstream, resolved here per SURVEY §2.3).
    """
    if not isinstance(pyramid, (list, tuple)):
        pyramid = [pyramid]
    feats = [sample_volume_features(points, level) for level in pyramid]
    return jnp.concatenate(feats, axis=-1)


_MAPPINGS = {
    "CustomMappingNetwork": CustomMappingNetwork,
    "LongMappingNetwork": LongMappingNetwork,
    "PointFeaturesMappingNetwork": PointFeaturesMappingNetwork,
}


@dataclasses.dataclass(frozen=True)
class SirenSpec:
    """Declarative description of one SIREN variant."""

    layers: tuple[str, ...]  # 'film' | 'siren' | 'res'
    input: str  # 'points' | 'features' | 'features_points' | 'pyramid'
    mapping: str | None  # 'linear' | 'pointfeat' | 'selectable' | None
    mapping_source: str | None  # 'global' | 'sampled_features' | 'z'
    freq_init: float = 25.0
    output: str = "raw"  # 'raw' | 'sigmoid_rgb'


SIREN_SPECS: dict[str, SirenSpec] = {
    "TALLSIREN": SirenSpec(("film",) * 8, "points", "pointfeat", "sampled_features"),
    "TALLSIREN_dRes": SirenSpec(("siren", "res", "res", "siren"), "features", None, None),
    "TALLSIREN_dResLong": SirenSpec(
        ("siren", "res", "res", "res", "res", "siren"), "features", None, None
    ),
    "TALLSIREN_FG": SirenSpec(
        ("film",) * 8, "features", "linear", "global", 25.0, "sigmoid_rgb"
    ),
    "SHORTSIREN_FG": SirenSpec(
        ("film",) * 4, "features", "linear", "global", 12.0, "sigmoid_rgb"
    ),
    "SHORTSIREN_FG_Pyrmd": SirenSpec(
        ("film",) * 4, "pyramid", "linear", "global", 12.0, "sigmoid_rgb"
    ),
    "DOUBLESIREN_FG": SirenSpec(
        ("film",) * 2, "features", "linear", "global", 12.0, "sigmoid_rgb"
    ),
    "SHORTSIREN_F": SirenSpec(
        ("siren",) * 4, "features", None, None, 12.0, "sigmoid_rgb"
    ),
    "SHORTSIREN_FRes": SirenSpec(
        ("siren", "res", "siren"), "features", None, None, 12.0, "sigmoid_rgb"
    ),
    "SingleSIREN_dg": SirenSpec(("film",), "features", "linear", "global", 25.0, "raw"),
    "TALLSIREN_dgx": SirenSpec(
        ("film",) * 8, "features_points", "linear", "global", 25.0, "raw"
    ),
    "SHORTSIREN": SirenSpec(
        ("film",) * 4, "points", "selectable", "z", 25.0, "sigmoid_rgb"
    ),
}


class ConditionedSiren(nn.Module):
    """Generic conditioned FiLM-SIREN decoder (see module docstring)."""

    spec: SirenSpec
    z_dim: int = 100
    hidden_dim: int = 256
    output_dim: int = 4
    drop_out: float = 0.0
    mapping_network: str = "CustomMappingNetwork"  # for spec.mapping='selectable'
    compute_dtype: jnp.dtype | None = None  # bf16 matmuls w/ fp32 sin epilogue
    use_fast_sin: bool = False  # range-reduced polynomial sin (ops/fastmath.py)
    use_pallas: bool = False  # fused point-eval kernel (ops/pallas/film_siren)

    @nn.compact
    def __call__(self, points, z, deterministic: bool = True):
        """points: (B, N, 3) world points; z: conditioning (array or tuple)."""
        spec = self.spec

        # ---- resolve conditioning inputs -------------------------------
        feature_volume = global_feature = None
        if spec.input in ("features", "features_points") or (
            spec.mapping_source == "sampled_features"
        ):
            feature_volume = z[0] if isinstance(z, (tuple, list)) else z
            if isinstance(z, (tuple, list)):
                global_feature = z[1]
        elif spec.input == "pyramid":
            pyramid, global_feature = z
        elif spec.mapping_source in ("global", "z"):
            if isinstance(z, (tuple, list)):
                feature_volume, global_feature = z
            else:
                global_feature = z

        # ---- first-layer input -----------------------------------------
        # sample_pyramid_features degrades to a plain volume lookup for
        # non-list feature_volume, so every features-input variant also
        # composes with the PyramidUNet3D encoder (see its docstring)
        if spec.input == "points":
            x = points
        elif spec.input == "features":
            x = sample_pyramid_features(points, feature_volume)
        elif spec.input == "features_points":
            feats = sample_pyramid_features(points, feature_volume)
            x = jnp.concatenate([feats, points], axis=-1)
        elif spec.input == "pyramid":
            x = sample_pyramid_features(points, pyramid)
        else:
            raise ValueError(spec.input)

        # ---- FiLM conditioning -----------------------------------------
        freq = phase = None
        if spec.mapping is not None:
            n_film = len(spec.layers)
            out_dim = n_film * self.hidden_dim * 2
            if spec.mapping == "linear":
                mapping = LinearMapping(out_dim, name="mapping_network")
                src = global_feature
            elif spec.mapping == "pointfeat":
                mapping = PointFeaturesMappingNetwork(
                    hidden_dim=256, output_dim=out_dim, name="mapping_network"
                )
                # pyramid-encoder composition, like the input-path branches
                # above (degrades to a plain volume lookup for one volume)
                src = sample_pyramid_features(points, feature_volume)
            elif spec.mapping == "selectable":
                mapping = _MAPPINGS[self.mapping_network](
                    hidden_dim=256, output_dim=out_dim, name="mapping_network"
                )
                src = global_feature
            else:
                raise ValueError(spec.mapping)
            freq, phase = mapping(src)
            freq = freq * 15.0 + 30.0

        # ---- fused point-eval kernel (ops/pallas/film_siren.py) ---------
        # All-film stacks route through the Pallas kernel at apply time; the
        # layer-by-layer path below still CREATES the params (so the tree and
        # golden param names are identical) and serves init/off-TPU/autodiff.
        if (
            self.use_pallas
            and not self.is_initializing()
            and all(k == "film" for k in spec.layers)
            # the kernel stacks the trunk layers beyond the first — a
            # single-film spec (SingleSIREN_dg) has nothing to stack
            and len(spec.layers) >= 2
            and freq is not None
            and freq.ndim == 2
            and self.drop_out == 0
            # the kernel is bf16-matmul-only with a degree-7 sin (error
            # 15× under the bf16 noise floor), and its custom VJP
            # differentiates the folded bf16+fast_sin formulation; only
            # route when the module is configured to match, so use_pallas
            # can't silently override the precision/sin config
            and self.use_fast_sin
            and self.compute_dtype == jnp.bfloat16
        ):
            from ..ops.pallas.film_siren import film_siren_mlp

            p = self.variables["params"]
            lins = [p[f"FiLMLayer_{i}"]["TorchLinear_0"]
                    for i in range(len(spec.layers))]
            rgb_sigma = film_siren_mlp(
                x, freq, phase,
                lins[0]["kernel"], lins[0]["bias"],
                jnp.stack([l["kernel"] for l in lins[1:]]),
                jnp.stack([l["bias"] for l in lins[1:]]),
                p["final_layer"]["kernel"], p["final_layer"]["bias"],
            )
            if spec.output == "sigmoid_rgb":
                rgb_sigma = sigmoid_rgb(rgb_sigma)
            return rgb_sigma

        # ---- layer stack ------------------------------------------------
        finit = frequency_init(spec.freq_init)
        for idx, kind in enumerate(spec.layers):
            kinit = first_layer_film_sine_init if idx == 0 else finit
            if kind == "film":
                lo = idx * self.hidden_dim
                hi = (idx + 1) * self.hidden_dim
                x = FiLMLayer(
                    self.hidden_dim, kernel_init=kinit,
                    drop_out_prob=self.drop_out, dtype=self.compute_dtype,
                    use_fast_sin=self.use_fast_sin,
                )(x, freq[..., lo:hi], phase[..., lo:hi], deterministic=deterministic)
            elif kind == "siren":
                x = SirenLayer(
                    self.hidden_dim, kernel_init=kinit,
                    drop_out_prob=self.drop_out, dtype=self.compute_dtype,
                    use_fast_sin=self.use_fast_sin,
                )(x, deterministic=deterministic)
            elif kind == "res":
                x = ResSirenBlock(self.hidden_dim, kernel_init=finit,
                                  dtype=self.compute_dtype,
                                  use_fast_sin=self.use_fast_sin)(
                    x, deterministic=deterministic
                )
            else:
                raise ValueError(kind)

        rgb_sigma = TorchLinear(
            self.output_dim, kernel_init=finit, name="final_layer"
        )(x)
        if spec.output == "sigmoid_rgb":
            rgb_sigma = sigmoid_rgb(rgb_sigma)
        return rgb_sigma


class UniformBoxWarp(nn.Module):
    """coordinates * 2/sidelength (reference siren.py:1245-1251)."""

    sidelength: float

    def __call__(self, coordinates):
        return coordinates * (2.0 / self.sidelength)


class SpatialSirenBaseline(nn.Module):
    """Unconditional pi-GAN baseline with view-dependent color head.

    Reference siren.py:1254-1325 (`SPATIALSIRENBASELINE`): 8 FiLM layers →
    sigma head; color = sigmoid(linear(FiLM([ray_dirs, x]))) using the last
    freq/phase slice; input gridwarped by sidelength 0.24.
    """

    z_dim: int = 100
    hidden_dim: int = 256
    output_dim: int = 4
    drop_out: float = 0.0
    compute_dtype: jnp.dtype | None = None
    use_fast_sin: bool = False

    @nn.compact
    def __call__(self, points, z, ray_directions=None, deterministic: bool = True):
        n_layers = 8
        out_dim = (n_layers + 1) * self.hidden_dim * 2
        freq, phase = CustomMappingNetwork(
            hidden_dim=256, output_dim=out_dim, name="mapping_network"
        )(z)
        freq = freq * 15.0 + 30.0

        x = UniformBoxWarp(0.24)(points)
        finit = frequency_init(25)
        film = dict(dtype=self.compute_dtype, use_fast_sin=self.use_fast_sin)
        for idx in range(n_layers):
            kinit = first_layer_film_sine_init if idx == 0 else finit
            lo, hi = idx * self.hidden_dim, (idx + 1) * self.hidden_dim
            x = FiLMLayer(self.hidden_dim, kernel_init=kinit,
                          drop_out_prob=self.drop_out, **film)(
                x, freq[..., lo:hi], phase[..., lo:hi], deterministic=deterministic
            )

        sigma = TorchLinear(1, kernel_init=finit, dtype=self.compute_dtype,
                            name="final_layer")(x)
        if ray_directions is None:
            ray_directions = jnp.zeros_like(points)
        color_in = jnp.concatenate(
            [ray_directions.astype(x.dtype), x], axis=-1
        )
        rgb = FiLMLayer(self.hidden_dim, kernel_init=finit, **film,
                        name="color_layer_sine")(
            color_in, freq[..., -self.hidden_dim:], phase[..., -self.hidden_dim:],
            deterministic=deterministic,
        )
        rgb = jax.nn.sigmoid(
            TorchLinear(3, kernel_init=finit, dtype=self.compute_dtype,
                        name="color_layer_linear")(rgb)
        )
        return jnp.concatenate([rgb, sigma.astype(rgb.dtype)], axis=-1)


class EmbeddingPiGAN(nn.Module):
    """pi-GAN with a learned spatial embedding cube.

    Reference siren.py:1359-1441 (`EmbeddingPiGAN128/256`): features sampled
    from a learnable (1, 32, E, E, E) grid with align_corners=True / zeros
    padding (`sample_from_3dgrid`, siren.py:1328-1348), concatenated with the
    gridwarped input.
    """

    z_dim: int = 100
    hidden_dim: int = 128
    output_dim: int = 4
    drop_out: float = 0.0
    embedding_res: int = 96
    embedding_scale: float = 0.01
    compute_dtype: jnp.dtype | None = None
    use_fast_sin: bool = False

    @nn.compact
    def __call__(self, points, z, ray_directions=None, deterministic: bool = True):
        n_layers = 8
        out_dim = (n_layers + 1) * self.hidden_dim * 2
        freq, phase = CustomMappingNetwork(
            hidden_dim=256, output_dim=out_dim, name="mapping_network"
        )(z)
        freq = freq * 15.0 + 30.0

        warped = UniformBoxWarp(0.24)(points)
        emb = self.param(
            "spatial_embeddings",
            lambda key, shape: jax.random.normal(key, shape) * self.embedding_scale,
            (1, self.embedding_res, self.embedding_res, self.embedding_res, 32),
        )
        B = points.shape[0]
        emb_b = jnp.broadcast_to(emb, (B, *emb.shape[1:]))
        shared = trilinear_point_features(
            emb_b, warped, align_corners=True, padding_mode="zeros"
        )
        x = jnp.concatenate([shared, warped], axis=-1)

        finit = frequency_init(25)
        film = dict(dtype=self.compute_dtype, use_fast_sin=self.use_fast_sin)

        def modified_first_init(key, shape, dtype=jnp.float32):
            # reference `modified_first_sine_init` uses num_input=3 regardless
            return jax.random.uniform(key, shape, dtype, -1.0 / 3.0, 1.0 / 3.0)

        for idx in range(n_layers):
            kinit = modified_first_init if idx == 0 else finit
            lo, hi = idx * self.hidden_dim, (idx + 1) * self.hidden_dim
            x = FiLMLayer(self.hidden_dim, kernel_init=kinit,
                          drop_out_prob=self.drop_out, **film)(
                x, freq[..., lo:hi], phase[..., lo:hi], deterministic=deterministic
            )

        sigma = TorchLinear(1, kernel_init=finit, dtype=self.compute_dtype,
                            name="final_layer")(x)
        if ray_directions is None:
            ray_directions = jnp.zeros_like(points)
        color_in = jnp.concatenate(
            [ray_directions.astype(x.dtype), x], axis=-1
        )
        rgb = FiLMLayer(self.hidden_dim, kernel_init=finit, **film,
                        name="color_layer_sine")(
            color_in, freq[..., -self.hidden_dim:], phase[..., -self.hidden_dim:],
            deterministic=deterministic,
        )
        rgb = jax.nn.sigmoid(
            TorchLinear(3, kernel_init=finit, dtype=self.compute_dtype,
                        name="color_layer_linear")(rgb)
        )
        return jnp.concatenate([rgb, sigma.astype(rgb.dtype)], axis=-1)


def make_siren(
    siren_type: str,
    *,
    z_dim: int = 100,
    input_dim: int = 3,
    output_dim: int = 4,
    hidden_dim: int = 256,
    drop_out: float = 0.0,
    mapping_network: str = "CustomMappingNetwork",
    compute_dtype=None,
    use_fast_sin: bool = False,
    use_pallas: bool = False,
    **_unused,
) -> nn.Module:
    """Build a SIREN variant by reference class name (generators.py:15)."""
    from ..config.presets import resolve_siren_alias

    siren_type = resolve_siren_alias(siren_type)
    if siren_type in SIREN_SPECS:
        return ConditionedSiren(
            spec=SIREN_SPECS[siren_type],
            z_dim=z_dim,
            hidden_dim=hidden_dim,
            output_dim=output_dim,
            drop_out=drop_out,
            mapping_network=mapping_network,
            compute_dtype=compute_dtype,
            use_pallas=use_pallas,
            use_fast_sin=use_fast_sin,
        )
    legacy = dict(compute_dtype=compute_dtype, use_fast_sin=use_fast_sin)
    if siren_type == "SPATIALSIRENBASELINE":
        return SpatialSirenBaseline(
            z_dim=z_dim, hidden_dim=hidden_dim, output_dim=output_dim,
            drop_out=drop_out, **legacy,
        )
    if siren_type == "EmbeddingPiGAN128":
        return EmbeddingPiGAN(
            z_dim=z_dim, hidden_dim=128, output_dim=output_dim, drop_out=drop_out,
            embedding_res=96, embedding_scale=0.01, **legacy,
        )
    if siren_type == "EmbeddingPiGAN256":
        return EmbeddingPiGAN(
            z_dim=z_dim, hidden_dim=256, output_dim=output_dim, drop_out=drop_out,
            embedding_res=64, embedding_scale=0.1, **legacy,
        )
    raise ValueError(f"Unknown siren_type {siren_type!r}")


SIREN_REGISTRY = tuple(SIREN_SPECS) + (
    "SPATIALSIRENBASELINE",
    "EmbeddingPiGAN128",
    "EmbeddingPiGAN256",
)
