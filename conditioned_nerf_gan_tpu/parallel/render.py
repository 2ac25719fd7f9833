"""Ray-axis sharded rendering (the context-parallel analogue).

Training parallelism is batch-only (mesh.py) — matching the reference's DDP
design point. Inference is different: a single high-resolution render has
batch 1 but img_size² × num_steps × 2 sample points, so the profitable axis
is the *ray* axis (SURVEY §5, "long-sequence analogue"). Here one image's
pixel rows are split across the mesh with `shard_map`: every device holds the
replicated params/conditioning, renders its horizontal slab via the
generator's row_offset/render_rows hook (models/generator.py), and the
sharded output rows concatenate into the full image — no collectives beyond
the implicit all-gather of the output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# compiled shard_map renders, keyed on everything shape/graph-affecting.
# fov / nerf_noise / the PRNG key are *traced* arguments so per-frame fov
# sweeps (orbit videos) reuse one executable instead of recompiling — the
# remote-TPU compile cost makes a per-frame retrace pathological.
# Bounded LRU-ish eviction (insertion order): inference uses a handful of
# RenderConfig/mesh combinations per process, but an unbounded dict would
# pin every compiled executable + its device objects for the process
# lifetime if a caller sweeps configs.
_FN_CACHE: dict = {}
_FN_CACHE_MAX = 16


def _sharded_render_fn(generator, config, mesh, axis_name, use_noise):
    cache_key = (generator, config, mesh, axis_name, use_noise)
    fn = _FN_CACHE.pop(cache_key, None)
    if fn is not None:
        _FN_CACHE[cache_key] = fn  # refresh: true LRU, hot entries survive
        return fn
    while len(_FN_CACHE) >= _FN_CACHE_MAX:
        _FN_CACHE.pop(next(iter(_FN_CACHE)))
    rows = config.img_size // mesh.devices.size

    def local(params, z, cams, key, nerf_noise, fov):
        idx = jax.lax.axis_index(axis_name)
        k = jax.random.fold_in(key, idx) if use_noise else None
        return generator.apply(
            params, z, cams, config, rng=k, nerf_noise=nerf_noise,
            deterministic=True, fov=fov,
            row_offset=idx * rows, render_rows=rows,
        )

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(),) * 6,
        out_specs=(P(None, axis_name), P(None, axis_name)),
        check_vma=False,
    ))
    _FN_CACHE[cache_key] = fn
    return fn


def render_ray_sharded(
    generator,
    params,
    z,
    cam2world,
    config,
    mesh: Mesh,
    axis_name: str = "data",
    *,
    rng: jax.Array | None = None,
    nerf_noise=0.0,
    fov=None,
):
    """Render one batch of images with pixel rows sharded over the mesh.

    Equivalent to `generator.apply(params, z, cam2world, config, ...)` but
    each device computes img_size / n_devices rows. img_size must divide
    evenly. With `rng`, per-slab noise keys are decorrelated by folding in
    the device index (so the result differs from the single-device noisy
    render; deterministic renders are bitwise-identical).
    """
    n = mesh.devices.size
    H = config.img_size
    if H % n != 0:
        raise ValueError(f"img_size {H} must divide over {n} devices")

    fn = _sharded_render_fn(generator, config, mesh, axis_name, rng is not None)
    key = jax.random.PRNGKey(0) if rng is None else rng
    fov_t = jnp.asarray(config.fov if fov is None else fov, jnp.float32)
    noise_t = jnp.float32(nerf_noise)
    repl = NamedSharding(mesh, P())
    params, z, cam2world, key = jax.device_put((params, z, cam2world, key), repl)
    return fn(params, z, cam2world, key, noise_t, fov_t)
