"""Device-mesh parallelism (pjit + NamedSharding over ICI)."""

from .render import render_ray_sharded
from .mesh import (
    make_mesh,
    shard_batch,
    replicate,
    compile_train_step,
    data_sharding,
)
from .distributed import (
    compile_aligned,
    initialize_distributed,
    distributed_requested,
    sync_processes,
)

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "compile_train_step",
    "data_sharding",
    "render_ray_sharded",
    "compile_aligned",
    "initialize_distributed",
    "distributed_requested",
    "sync_processes",
]
