"""conditioned_nerf_gan_tpu — a TPU-native (JAX/XLA/Pallas/pjit) conditional
NeRF-GAN framework with the capabilities of zzhuolun/conditioned-nerf-gan.

The framework reconstructs photo-realistic renderings of ShapeNet objects from
coarse geometry (colored voxel grid or colored point cloud): an encoder (3D
U-Net or ResNet-PointNet) conditions a FiLM-SIREN NeRF, volume rendering
produces images, and a progressive-growing discriminator supplies the
adversarial loss.

Layout (bottom-up):
    ops/       pure rendering math: rays, integration, importance sampling,
               trilinear grid sampling; `ops/pallas/` holds fused TPU kernels.
    models/    Flax modules: SIREN variants, mapping networks, 3D U-Net,
               PointNet, progressive discriminators, the generator composition.
    parallel/  device mesh + sharding helpers (pjit/shard_map over ICI).
    data/      host-side ShapeNet pipeline and synthetic fixtures.
    training/  losses, optimizer chains, the jitted train step, Trainer runtime.
    config/    curriculum system + presets.
    eval/      FID / oFID / LPIPS / PSNR metric stack.
    infer/     inference runtime (images / video / pcl / voxel / interpolate).
"""

__version__ = "0.1.0"
