"""Offline tools: voxel baseline renderer, voxelization, diagnostics scripts.

Each module is runnable as `python -m conditioned_nerf_gan_tpu.tools.<name>`,
mirroring the reference's `feature_volume/` and `misc/` script collections.
"""
