"""One process of the 2-process END-TO-END Trainer harness.

Launched twice by tests/test_multihost.py::test_two_process_trainer_loop:
    python multihost_trainer_worker.py <proc_id> <port> <out_dir> <data_root>
Both processes drive the full Trainer loop (train steps over the global
8-device mesh, per-process input shards, checkpointing on the main process,
and the FID evaluation with its cross-process barriers + per-process image
shards) against one shared output directory — the localhost analogue of a
multi-host run on a shared filesystem.

With a 5th argument `spd` (steps_per_dispatch), the worker instead runs the
chained-window parity variant used by test_two_process_chained_windows: a
10-step eval-free run whose loss histories land in <out_dir>/histories.npz
(main process), so chained (k, B, ...) global-array assembly from
process-local shards can be compared against the per-step multi-process run.
"""

import os
import sys
import types
from pathlib import Path

proc_id = int(sys.argv[1])
port = sys.argv[2]
out_dir = Path(sys.argv[3])
data_root = sys.argv[4]
spd = int(sys.argv[5]) if len(sys.argv) > 5 else None

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

if spd is None:
    args = types.SimpleNamespace(
        output_dir=str(out_dir), load_dir="", load_curriculum="",
        sampling_interval=10_000, print_freq=2, eval_freq=3,
        n_epochs=100, stop_step=4, config=None, config_base="smoke", seed=0,
    )
else:
    # chained-window parity variant: no eval/sample/print gates inside the
    # 10-step horizon, so spd=4 dispatches full windows [0..3] and [4..7]
    # whose stacked (k, B, ...) batches are assembled from the two
    # processes' local shards (shard_batch batch_axis=1)
    import copy

    from conditioned_nerf_gan_tpu.config import (
        curriculum_to_json,
        load_curriculum,
    )

    cur = copy.deepcopy(load_curriculum(config_base="smoke"))
    cur["steps_per_dispatch"] = spd
    cur_path = out_dir / f"curriculum_spd_{proc_id}.json"
    curriculum_to_json(cur, cur_path)
    args = types.SimpleNamespace(
        output_dir=str(out_dir), load_dir="", load_curriculum=str(cur_path),
        sampling_interval=10_000, print_freq=100, eval_freq=10_000,
        n_epochs=100, stop_step=9, config=None, config_base="smoke", seed=0,
    )
trainer = Trainer(
    args, process_index=jax.process_index(), process_count=jax.process_count(),
)
trainer.load_models()
trainer.train()

losses = trainer.histories["photometry_losses"]
if spd is None:
    assert len(losses) >= 4 and all(np.isfinite(losses)), losses
    if proc_id == 0:
        assert trainer.histories["fid_history"], "evaluate() never produced metrics"
        assert all(np.isfinite(trainer.histories["fid_history"][0][:2]))
else:
    assert len(losses) == 10 and all(np.isfinite(losses)), losses
    # epochs are 4 batches/process: [0..3] and [4..7] chain; 8-9 fall back
    expect_chains = 2 if spd > 1 else 0
    assert trainer._chain_dispatches == expect_chains, (
        f"spd={spd}: expected {expect_chains} chained dispatches, got "
        f"{trainer._chain_dispatches}"
    )
    if proc_id == 0:
        np.savez(
            out_dir / "histories.npz",
            **{k: np.asarray(trainer.histories[k], np.float64)
               for k in ("photometry_losses", "generator_losses",
                         "discriminator_losses")},
        )
jax.distributed.shutdown()
print(f"trainer worker {proc_id} ok", flush=True)
