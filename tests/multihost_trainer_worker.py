"""One process of the 2-process END-TO-END Trainer harness.

Launched twice by tests/test_multihost.py::test_two_process_trainer_loop:
    python multihost_trainer_worker.py <proc_id> <port> <out_dir> <data_root>
Both processes drive the full Trainer loop (train steps over the global
8-device mesh, per-process input shards, checkpointing on the main process,
and the FID evaluation with its cross-process barriers + per-process image
shards) against one shared output directory — the localhost analogue of a
multi-host run on a shared filesystem.
"""

import os
import sys
import types
from pathlib import Path

proc_id = int(sys.argv[1])
port = sys.argv[2]
out_dir = Path(sys.argv[3])
data_root = sys.argv[4]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["CNG_DATASET_PATH"] = data_root
os.environ["CNG_EVAL_IMAGES"] = str(out_dir / "EvalImages")
REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
from conditioned_nerf_gan_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache(REPO_ROOT / ".jax_cache")

from conditioned_nerf_gan_tpu.parallel import initialize_distributed  # noqa: E402

os.environ["CNG_COORDINATOR"] = f"localhost:{port}"
os.environ["CNG_NUM_PROCESSES"] = "2"
os.environ["CNG_PROCESS_ID"] = str(proc_id)
initialize_distributed()
assert jax.process_count() == 2 and jax.device_count() == 8

import numpy as np  # noqa: E402

from conditioned_nerf_gan_tpu.training import Trainer  # noqa: E402

args = types.SimpleNamespace(
    output_dir=str(out_dir), load_dir="", load_curriculum="",
    sampling_interval=10_000, print_freq=2, eval_freq=3,
    n_epochs=100, stop_step=4, config=None, config_base="smoke", seed=0,
)
trainer = Trainer(
    args, process_index=jax.process_index(), process_count=jax.process_count(),
)
trainer.load_models()
trainer.train()

losses = trainer.histories["photometry_losses"]
assert len(losses) >= 4 and all(np.isfinite(losses)), losses
if proc_id == 0:
    assert trainer.histories["fid_history"], "evaluate() never produced metrics"
    assert all(np.isfinite(trainer.histories["fid_history"][0][:2]))
jax.distributed.shutdown()
print(f"trainer worker {proc_id} ok", flush=True)
