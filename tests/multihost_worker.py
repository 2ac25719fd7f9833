"""One process of the 2-process multi-host parity harness.

Launched twice by tests/test_multihost.py:
    python multihost_worker.py <process_id> <port> <out_npz>
Each process gets 4 virtual CPU devices; together they form the same
8-device data mesh as the single-process reference, with each process
feeding its half of the global batch through the
`jax.make_array_from_process_local_data` path.
"""

import os
import sys
from pathlib import Path

proc_id = int(sys.argv[1])
port = sys.argv[2]
out_path = Path(sys.argv[3])

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))
sys.path.insert(0, str(REPO_ROOT / "tests"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from conditioned_nerf_gan_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache(REPO_ROOT / ".jax_cache")

from conditioned_nerf_gan_tpu.parallel import (  # noqa: E402
    initialize_distributed,
    make_mesh,
    sync_processes,
)

os.environ["CNG_COORDINATOR"] = f"localhost:{port}"
os.environ["CNG_NUM_PROCESSES"] = "2"
os.environ["CNG_PROCESS_ID"] = str(proc_id)
initialize_distributed()

assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import numpy as np  # noqa: E402

import multihost_common as mh  # noqa: E402

mesh = make_mesh()
gbatch = mh.global_batch()
half = mh.GLOBAL_BATCH // 2
local = {k: v[proc_id * half : (proc_id + 1) * half] for k, v in gbatch.items()}

metrics, flat = mh.run_one_step(mesh, local)

sync_processes("worker_step_done")  # exercises the barrier path too

# the manual shard_map step (Pallas-kernel composition): its pmean
# collectives must cross the process boundary and yield finite metrics
manual_metrics = mh.run_one_step_manual(mesh, local)
assert all(np.isfinite(v) for v in manual_metrics.values()), manual_metrics
sync_processes("worker_manual_step_done")

if proc_id == 0:
    np.savez(out_path, flat=flat,
             **{f"metric_{k}": v for k, v in metrics.items()},
             **{f"manual_metric_{k}": v for k, v in manual_metrics.items()})
jax.distributed.shutdown()
print(f"worker {proc_id} ok", flush=True)
