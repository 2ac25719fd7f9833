"""Flax model zoo: SIREN variants, mapping networks, encoders, discriminators."""

from .layers import (
    TorchLinear,
    FiLMLayer,
    SirenLayer,
    ResSirenBlock,
    CustomMappingNetwork,
    PointFeaturesMappingNetwork,
    LongMappingNetwork,
    LinearMapping,
)
from .siren import SIREN_REGISTRY, make_siren, sigmoid_rgb
from .pointnet import ResnetPointnet, encode_pcl
from .unet3d import UNet3D, ResidualUNet3D, PyramidUNet3D, make_unet
from .discriminators import (
    DISCRIMINATOR_REGISTRY,
    make_discriminator,
    ProgressiveDiscriminator,
    ProgressiveEncoderDiscriminator,
    ProgressiveDiscriminatorInputCat,
    ProgressiveDiscriminatorProjection,
)
from .generator import ImplicitGenerator3d, RenderConfig

__all__ = [
    "TorchLinear",
    "FiLMLayer",
    "SirenLayer",
    "ResSirenBlock",
    "CustomMappingNetwork",
    "PointFeaturesMappingNetwork",
    "LongMappingNetwork",
    "LinearMapping",
    "SIREN_REGISTRY",
    "make_siren",
    "sigmoid_rgb",
    "ResnetPointnet",
    "encode_pcl",
    "UNet3D",
    "ResidualUNet3D",
    "PyramidUNet3D",
    "make_unet",
    "DISCRIMINATOR_REGISTRY",
    "make_discriminator",
    "ProgressiveDiscriminator",
    "ProgressiveEncoderDiscriminator",
    "ProgressiveDiscriminatorInputCat",
    "ProgressiveDiscriminatorProjection",
    "ImplicitGenerator3d",
    "RenderConfig",
]
