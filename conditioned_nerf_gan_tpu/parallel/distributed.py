"""Multi-host (multi-process) runtime wiring.

The reference runs multi-GPU through `mp.spawn` + a gloo process group +
DDP + explicit `dist.barrier()` calls (reference train.py:36-44,231-246,
utils.py:322-401,988,1000). The TPU-native equivalent is much thinner:

  * `jax.distributed.initialize()` once per process (TPU pods auto-detect
    everything; CPU/GPU need coordinator/num_processes/process_id),
  * global arrays assembled from per-process shards with
    `jax.make_array_from_process_local_data` (mesh.shard_batch),
  * the jitted step runs SPMD over the global mesh — gradient reduction is
    the XLA psum riding ICI within hosts and DCN across them,
  * `sync_processes` replaces `dist.barrier()` around filesystem
    rendezvous (eval image shards).

Verified by the 2-process × 4-virtual-CPU-device harness in
tests/test_multihost.py, which asserts the 2-process global step matches
the 1-process 8-device step.
"""

from __future__ import annotations

import itertools
import os

import jax


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Start the cross-process runtime (call before any other JAX use).

    Arguments fall back to CNG_COORDINATOR / CNG_NUM_PROCESSES /
    CNG_PROCESS_ID env vars; with everything absent,
    `jax.distributed.initialize()` auto-detects the topology (the normal
    case on TPU pod slices, where the runtime env provides it).
    """
    coordinator = coordinator or os.environ.get("CNG_COORDINATOR") or None
    if num_processes is None and os.environ.get("CNG_NUM_PROCESSES"):
        num_processes = int(os.environ["CNG_NUM_PROCESSES"])
    if process_id is None and os.environ.get("CNG_PROCESS_ID"):
        process_id = int(os.environ["CNG_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    if jax.process_count() > 1:
        # Establish the cross-process device-collective context NOW, while
        # the processes are aligned. XLA's CPU gloo context creation has a
        # hard 30 s key-value rendezvous window at the FIRST collective; if
        # that first collective happened after minutes of (skewed) compile
        # work it would flake. The coordination-service barrier (generous
        # timeout) brings everyone to the same line first, then the tiny
        # psum pays the gloo KV exchange with near-zero skew and caches the
        # all-device communicator for the rest of the run.
        sync_processes("post_init", timeout_ms=600_000)
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gloo_context_warmup")


def compile_aligned(jitted, *args, **kwargs):
    """AOT-compile `jitted` for `args` with cross-process alignment.

    XLA's CPU gloo collectives carry a hard, unconfigurable 30 s key-value
    rendezvous window at communicator creation — the first *execution* of
    each new multi-process executable. Plain `jit` compiles lazily inside
    that first call, so on a contended host two processes can finish their
    (minutes-long) compiles >30 s apart and the early one times out waiting
    in the gloo rendezvous. This helper removes both the skew and the
    duplicated work:

      * process 0 compiles first and populates the shared persistent
        compile cache; the other processes then compile the identical SPMD
        program as a fast cache deserialize,
      * a coordination-service barrier (generous timeout, no device
        collective) puts every process at the execution start line
        together, so the gloo communicator exchange happens with near-zero
        skew.

    Returns the `Compiled` callable — call it with arguments of the same
    shapes/shardings. Single-process: equivalent to lower+compile.
    """
    lowered = jitted.lower(*args, **kwargs)
    if jax.process_count() <= 1:
        return lowered.compile()
    if jax.process_index() == 0:
        compiled = lowered.compile()
        sync_processes("leader_compiled")
    else:
        sync_processes("leader_compiled")
        compiled = lowered.compile()
    sync_processes("all_compiled")
    return compiled


def distributed_requested(args=None) -> bool:
    """True if CLI flags or env vars ask for multi-process execution."""
    if args is not None and (
        getattr(args, "distributed", False) or getattr(args, "coordinator", None)
    ):
        return True
    return bool(os.environ.get("CNG_COORDINATOR"))


_BARRIER_IDS = itertools.count()


def sync_processes(name: str, timeout_ms: int = 600_000) -> None:
    """Cross-process barrier (the reference's dist.barrier(), utils.py:988).

    Uses the distributed *coordination service* barrier rather than a device
    collective: XLA's CPU gloo collectives carry a hard 30 s rendezvous
    deadline, so a barrier that must absorb long one-sided work (process 0
    computing FID while the others wait — exactly the eval flow) would time
    out as a psum. The coordination barrier takes an explicit timeout.
    Barrier names get a per-process counter suffix; call sites execute in
    identical order on every process, so the counters agree.

    No-op in single-process runs, so call sites need no gating.
    """
    if jax.process_count() <= 1:
        return
    tag = f"cng_{name}_{next(_BARRIER_IDS)}"
    from jax._src.distributed import global_state

    client = getattr(global_state, "client", None)
    if client is not None:
        client.wait_at_barrier(tag, timeout_in_ms=timeout_ms)
    else:  # initialized by other means; fall back to a device collective
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
