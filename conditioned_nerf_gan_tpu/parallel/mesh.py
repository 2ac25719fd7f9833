"""Data-parallel mesh utilities.

The reference's distribution layer is single-node multi-GPU DDP over gloo
(reference train.py:36-44, utils.py:322-401, datasets.py:268-302): gradient
allreduce + input sharding + rank-0 checkpointing. The TPU-native equivalent
needs none of that plumbing: the train step is jitted over a 1-D `data` mesh
with the batch sharded on axis 0 and parameters/optimizer state replicated;
XLA inserts the gradient psum over ICI automatically. Host-side input
sharding is `jax.process_index()`-keyed in the DataLoader.

The model itself is small (a 4×256 SIREN MLP + U-Net), so batch parallelism
is the only profitable axis — matching the reference's design point (SURVEY
§2, "DP / distributed backend"). The *ray* axis (img_size² × num_steps
sample points) is the long-sequence analogue; it is sharded implicitly by
sharding the batch, and per-image chunking is handled by remat/scan inside
the train step rather than a context-parallel mesh axis.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    """1-D data mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def data_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def shard_batch(
    batch: dict, mesh: Mesh, axis_name: str = "data",
    force_global: bool = False, batch_axis: int = 0,
) -> dict:
    """Place a host batch with axis 0 sharded across the mesh.

    Multi-process (multi-host) runs assemble a *global* array from each
    process's local shard via `jax.make_array_from_process_local_data`: the
    per-process batch becomes rows `[i*B_local, (i+1)*B_local)` of a
    global batch of `process_count * B_local` (the DDP-DistributedSampler
    analogue of reference datasets.py:268-302, but as one logical array).
    Single-process runs keep the cheap `device_put` path; `force_global`
    exercises the global-array assembly there too (used by the driver's
    dryrun so the multi-host path is compile-checked without multiple
    processes).

    batch_axis selects which array axis is the batch: 0 (default) for a
    plain batch, 1 for the steps_per_dispatch-stacked (k, B, ...) layout.
    """
    spec = P(*([None] * batch_axis), axis_name)
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() > 1 or force_global:
        out = {}
        n_proc = jax.process_count()
        for k, v in batch.items():
            if isinstance(v, list):
                continue
            local = np.asarray(v)
            global_shape = list(local.shape)
            global_shape[batch_axis] *= n_proc
            out[k] = jax.make_array_from_process_local_data(
                sharding, local, tuple(global_shape)
            )
        return out
    return {
        k: jax.device_put(v, sharding)
        for k, v in batch.items()
        if not isinstance(v, list)
    }


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / optimizer state) over the mesh.

    In multi-process runs the leaves may be process-local (host numpy from a
    checkpoint restore, or single-device arrays): every process holds the
    identical full value, so the replicated global array is assembled from
    process-local data directly.
    """
    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        def put(x):
            if isinstance(x, jax.Array) and x.sharding == sharding:
                return x
            local = np.asarray(jax.device_get(x))
            return jax.make_array_from_process_local_data(
                sharding, local, local.shape
            )

        return jax.tree.map(put, tree)
    return jax.device_put(tree, sharding)


def compile_train_step(train_step, mesh: Mesh, axis_name: str = "data",
                       manual: bool = False, stacked: bool = False):
    """jit the train step with batch sharded on `axis_name`, state replicated.

    Default (GSPMD): gradients reduce over ICI via the psum XLA inserts for
    the replicated parameter update; the returned state stays replicated.
    Numerics are bit-identical to the single-device program.

    manual=True (shard_map): the step runs as one manual SPMD region per
    device on its local batch shard, with explicit `pmean` collectives
    inside the step (build it with `make_train_step(..., axis_name=...)`).
    This is the only composition XLA accepts for Pallas/Mosaic kernels —
    GSPMD cannot partition a Mosaic custom call ("Please wrap the call in
    a shard_map") — so any train step that routes the fused FiLM-SIREN
    kernel on a >1-device mesh must take this path. The per-device batch
    is `global_batch / mesh_size` (must divide).

    stacked=True compiles a `make_chained_step` program instead: the batch
    arrays carry a leading steps_per_dispatch axis, so the data axis is
    array axis 1 (alpha/noise become replicated (k,) arrays).
    """
    batch_spec = P(None, axis_name) if stacked else P(axis_name)
    if manual:
        sharded = jax.shard_map(
            train_step,
            mesh=mesh,
            in_specs=(P(), batch_spec, P(), P(), P()),
            out_specs=(P(), P()),
            # grads/metrics are pmean'ed inside the step and params enter
            # replicated, so outputs are replicated by construction; the
            # static vma check can't see through optax update internals
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0,))
    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, batch_spec)
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh, repl, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
