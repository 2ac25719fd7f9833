"""Trainer: the end-to-end training runtime shell.

Parity target: reference utils.py:122-1016 (`Trainer`) + train.py:58-143 (the
epoch/step loop):
  * output-dir contract: checkpoints/, logs/, samples/{trainview,valview,
    testview}/, evaluation/ (utils.py:230-285)
  * four dataset splits: train, val (held-out view), test (unseen cars), fid
    (utils.py:139-189)
  * curriculum precedence + JSON persistence (utils.py:191-228, 440-461)
  * newest-checkpoint auto-resume; step counter re-derives all schedules
    (utils.py:287-319)
  * per-step metadata refresh; dataloader + compiled step rebuilt at stage
    milestones (train.py:84-88 — on TPU the stage change is a recompile point
    because batch/img/num_steps are shape-affecting)
  * fade-in alpha + nerf-noise schedules (utils.py:610-618)
  * tabulated stats every print_freq (utils.py:546-608), sample-image grids
    every sampling_interval (utils.py:844-915), fixed-index val/test losses
    (utils.py:917-972), checkpoint + FID eval every eval_freq
    (utils.py:463-501, 974-1016).
"""

from __future__ import annotations

import collections
import copy
import dataclasses
import random
import time
from datetime import datetime
from pathlib import Path
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..config import (
    curriculum_to_json,
    extract_metadata,
    last_upsample_step,
    load_curriculum,
)
from ..data import DataLoader, ShapeNetDataset
from ..models import ImplicitGenerator3d, ResnetPointnet, make_discriminator, make_unet
from ..models.generator import RenderConfig
from ..models.pointnet import encode_pcl
from ..parallel import (
    compile_aligned,
    compile_train_step,
    make_mesh,
    replicate,
    shard_batch,
    sync_processes,
)
from ..utils import save_image_grid
from .checkpoints import find_newest_checkpoint, restore_checkpoint, save_checkpoint
from .schedules import fade_alpha, nerf_noise_schedule
from .train_step import (
    TrainStepConfig,
    create_train_state,
    make_chained_step,
    make_train_step,
)

HISTORY_KEYS = (
    "generator_losses",
    "discriminator_losses",
    "photometry_losses",
    "depth_losses",
    "photometry_losses_val",
    "depth_losses_val",
    "photometry_losses_test",
    "depth_losses_test",
    "fid_history",
)


class Trainer:
    def __init__(self, args: Any, process_index: int = 0, process_count: int = 1,
                 mesh=None):
        self.args = args
        self.process_index = process_index
        self.process_count = process_count
        self.is_main = process_index == 0
        self.mesh = mesh if mesh is not None else make_mesh()
        # the untrimmed device set: _rebuild_step_fn re-trims from this at
        # every milestone, so a stage whose batch divides the full device
        # count gets the whole mesh back after a smaller stage trimmed it
        self._base_devices = list(self.mesh.devices.flat)
        # host copies of param subtrees for eval renders, keyed on
        # (step, state version) — one device_get per eval pass, not one
        # per generate_img/encode_batch dispatch (FID loops call these
        # hundreds of times per eval with unchanged params)
        self._host_params_cache: dict = {}
        self._state_version = 0

        self.curriculum = load_curriculum(
            output_dir=args.output_dir,
            load_dir=getattr(args, "load_dir", None) or None,
            load_curriculum_path=getattr(args, "load_curriculum", None) or None,
            config_base=getattr(args, "config_base", "thousand"),
            config=getattr(args, "config", None),
        )
        self.metadata = extract_metadata(self.curriculum, 0)
        self._mkdirs()
        self.histories = {k: [] for k in HISTORY_KEYS}
        self._render_cache: dict = {}
        # device-side metrics awaiting materialization: float() is the
        # device sync, and syncing every step serializes dispatch → compute
        # → transfer; the train loop queues metrics and keeps a small
        # in-flight window so the device pipeline stays busy back-to-back
        self._pending_metrics: collections.deque = collections.deque()
        # lifetime count of chained (steps_per_dispatch) window dispatches —
        # survives the per-stage executable invalidation in _rebuild_step_fn
        self._chain_dispatches = 0
        self.step = 0
        self.epoch = 0
        # dataloader position (epoch being consumed + batches consumed in
        # it), persisted in checkpoints so a resumed run replays the exact
        # batch sequence: with the per-step rng folded on state.step
        # (train_step.py), this makes resume bit-deterministic end to end.
        self._loader_epoch = 0
        self._batch_offset = 0
        self._restored_loader_state: dict | None = None

        ds_meta = self.metadata["dataset"]
        common = dict(
            metadata=self.metadata,
            load_voxel=ds_meta["load_voxel"],
            load_pcl=ds_meta["load_pcl"],
            voxel_resolution=self.metadata.get("voxel_resolution", 64),
        )
        # sample/val sets are read at the sample resolution (reference: 128²)
        sample_size = self.metadata.get("sample_img_size", 128)
        self.trainset = ShapeNetDataset(
            ds_meta["path"], sample_size, ds_meta["trainset"], shuffle=True,
            dataset_mode="train", **common,
        )
        self.valset = ShapeNetDataset(
            ds_meta["path"], sample_size, ds_meta["trainset"], shuffle=False,
            dataset_mode="val", **common,
        )
        self.testset = ShapeNetDataset(
            ds_meta["path"], sample_size, ds_meta["testset"], shuffle=False,
            dataset_mode="test", **common,
        )
        self.fidset = ShapeNetDataset(
            ds_meta["path"], self.metadata["fid"]["target_size"],
            self.metadata["fid"]["subset"], dataset_mode="test",
            load_img=False, load_depth=False, load_cam=True, shuffle=False,
            **common,
        )

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------
    def _mkdirs(self) -> None:
        out = Path(self.args.output_dir)
        self.checkpoints_path = out / "checkpoints"
        self.logs_path = out / "logs"
        self.samples_train_path = out / "samples" / "trainview"
        self.samples_val_path = out / "samples" / "valview"
        self.samples_test_path = out / "samples" / "testview"
        self.evaluation_path = out / "evaluation"
        if self.is_main:
            for p in (self.checkpoints_path, self.logs_path,
                      self.samples_train_path, self.samples_val_path,
                      self.samples_test_path, self.evaluation_path):
                p.mkdir(parents=True, exist_ok=True)

    def _build_models(self):
        gen_meta = dict(self.metadata["generator"])
        gen_meta.setdefault("drop_out", self.metadata.get("dropout_ratio", 0))
        # Mixed-precision policy (metadata "compute_dtype", a str-keyed —
        # i.e. run-constant — curriculum entry). The reference trains every
        # net under fp16 amp.autocast (utils.py:644-663, 803-829); here the
        # bf16 analogue needs no GradScaler. Params/grads/optimizer state
        # stay fp32 everywhere; SIREN keeps fp32 sin epilogues.
        dtype_name = self.metadata.get("compute_dtype")
        compute_dtype = jnp.dtype(dtype_name) if dtype_name else None
        self.generator = ImplicitGenerator3d(
            siren_type=gen_meta["siren_type"],
            z_dim=gen_meta["z_dim"],
            input_dim=gen_meta.get("input_dim", 3),
            output_dim=gen_meta.get("output_dim", 4),
            hidden_dim=gen_meta.get("hidden_dim", 256),
            drop_out=gen_meta.get("drop_out", 0),
            mapping_network=gen_meta.get("mapping_network",
                                         "CustomMappingNetwork"),
            compute_dtype=compute_dtype,
            use_fast_sin=self.metadata.get("use_fast_sin", False),
            use_pallas=self.metadata.get("use_pallas", False),
        )
        ds = self.metadata["dataset"]
        if ds["load_voxel"]:
            self.encoder = make_unet(dtype=compute_dtype, **self.metadata["unet"])
        elif ds["load_pcl"]:
            self.encoder = ResnetPointnet(c_dim=gen_meta["z_dim"],
                                          dtype=compute_dtype)
        else:
            raise ValueError("Either load_pcl or load_voxel must be set")
        self.discriminator = (
            make_discriminator(self.metadata["discriminator"], dtype=compute_dtype)
            if self.metadata["enable_discriminator"] else None
        )

    def load_models(self) -> None:
        """Build modules + TrainState; auto-resume from the newest checkpoint."""
        self._build_models()
        newest = find_newest_checkpoint(self.checkpoints_path)
        load_path = None
        if newest is not None:
            load_path = newest
        elif getattr(self.args, "load_dir", None):
            load_path = Path(self.args.load_dir)

        resume_step = int(load_path.stem) if load_path else 0
        self.step = resume_step
        self.metadata = extract_metadata(self.curriculum, resume_step)
        self.step_config = self._current_step_config(self.metadata)

        sample_batch = self._peek_batch()
        key = jax.random.PRNGKey(getattr(self.args, "seed", 0))
        init_fn = lambda k, b: create_train_state(  # noqa: E731
            k, self.generator, self.encoder,
            self.discriminator, b, self.step_config,
        )
        if self.process_count > 1:
            # Multi-host: init replicated over the *global* mesh in one SPMD
            # program. Inputs are host values (identical on every process —
            # same seed, deterministic loader peek), which jit broadcasts.
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(self.mesh, PartitionSpec())
            init_jit = jax.jit(init_fn, out_shardings=repl)
            # leader-first compile + barrier: every process must enter the
            # executable's first run (the gloo communicator rendezvous, a
            # hard 30 s window) together — see parallel.compile_aligned.
            self.state = compile_aligned(init_jit, np.asarray(key), sample_batch)(
                np.asarray(key), sample_batch
            )
        else:
            self.state = jax.jit(init_fn)(key, sample_batch)

        if load_path is not None:
            print(f"Resuming from checkpoint {load_path}")
            try:
                self.state, histories = restore_checkpoint(load_path, self.state)
            except (KeyError, ValueError, TypeError) as e:
                # The optimizer-state pytree no longer matches the optax
                # chain that wrote the checkpoint (e.g. a framework upgrade
                # changed the chain composition). Model params still load —
                # fall back to params-only with fresh optimizer state so a
                # long run survives the upgrade instead of dying at requeue.
                import warnings

                warnings.warn(
                    f"full checkpoint restore failed ({e}); falling back to "
                    "params-only resume with FRESH optimizer state — "
                    "momentum/second-moment statistics are reset",
                    stacklevel=2,
                )
                self.state, histories = restore_checkpoint(
                    load_path, self.state, params_only=True
                )
            for k in HISTORY_KEYS:
                self.histories[k] = histories.get(k, [])
            self.step = int(self.state.step)
            self._restored_loader_state = histories.get("loader_state")
        else:
            print("Creating untrained models")
        self._rebuild_step_fn()

    @property
    def state(self):
        return self._state

    @state.setter
    def state(self, value):
        # every reassignment (init, restore, replicate/re-place, train step)
        # bumps the version so _host_params_cache can't alias a stale copy
        # through a recycled id() after the old TrainState is collected
        self._state = value
        self._state_version += 1

    def _peek_batch(self) -> dict:
        loader = DataLoader(
            self._stage_dataset(), self.metadata["batch_size"],
            shuffle=False, drop_last=True,
        )
        batch = next(iter(loader))
        return {k: v for k, v in batch.items() if not isinstance(v, list)}

    def _stage_dataset(self) -> ShapeNetDataset:
        ds = self.metadata["dataset"]
        # curriculum `multifold` overrides the reference's hardcoded x3000
        # tiny-subset replication (datasets.py:239-241) — small custom
        # datasets need epochs of >= steps_per_dispatch batches to chain
        multifold = int(
            self.metadata.get("multifold")
            or (3000 if ds["trainset"] in ("twenty", "single") else 1)
        )
        return ShapeNetDataset(
            ds["path"], self.metadata["img_size"], ds["trainset"], self.metadata,
            ds["load_voxel"], ds["load_pcl"], shuffle=True, multifold=multifold,
            cond_mode=ds.get("cond_mode") or None,
            voxel_resolution=self.metadata.get("voxel_resolution", 64),
            load_depth=ds.get("load_depth", False) or self.metadata.get("depth_loss", False),
            seed=getattr(self.args, "seed", 0),
        )

    def _make_dataloader(self) -> DataLoader:
        return DataLoader(
            self._stage_dataset(), self.metadata["batch_size"], shuffle=True,
            drop_last=True, seed=getattr(self.args, "seed", 0),
            process_index=self.process_index, process_count=self.process_count,
        )

    def _current_step_config(self, metadata: dict) -> TrainStepConfig:
        """TrainStepConfig for `metadata` at the current training step.

        Applies the static density-noise gate: the reference's nerf-noise
        schedule is exactly 0 from step 5000 on (utils.py:618), so stages
        past that skip the per-integrate threefry + ×0 multiply entirely
        (the decay within a live stage stays a traced scalar). The schedule
        is monotone, so gating on the rebuild step is safe.
        """
        cfg = TrainStepConfig.from_metadata(metadata)
        if nerf_noise_schedule(self.step) <= 0.0:
            cfg = dataclasses.replace(
                cfg, render=dataclasses.replace(cfg.render,
                                                density_noise=False)
            )
        return cfg

    def _rebuild_step_fn(self) -> None:
        self.step_config = self._current_step_config(self.metadata)
        # the data axis must divide the global batch; single-host runs trim
        # the mesh to the largest usable device count (e.g. batch 4 on an
        # 8-device host). Multi-host meshes cannot be trimmed (every
        # process's devices must participate in the SPMD program), so the
        # config must divide — fail loudly instead of mis-sharding.
        devices = self._base_devices
        n_dev = len(devices)
        global_batch = self.metadata["batch_size"] * self.process_count
        if self.process_count > 1:
            if global_batch % n_dev != 0:
                raise ValueError(
                    f"global batch {global_batch} (= {self.metadata['batch_size']}"
                    f" per process x {self.process_count} processes) must divide"
                    f" over the {n_dev}-device mesh"
                )
        else:
            while n_dev > 1 and global_batch % n_dev != 0:
                n_dev -= 1
            if n_dev != self.mesh.size:
                # trim to the largest usable subset — or grow back to it,
                # when a later stage's batch divides more of the base set
                # than the previous stage's did
                self.mesh = make_mesh(devices[:n_dev])
        # GSPMD cannot partition Mosaic kernels, so a use_pallas generator
        # on a >1-device mesh needs the manual shard_map step (explicit
        # pmean, per-device rng streams); pure-XLA steps keep the GSPMD
        # path, which is bit-identical to single-device execution.
        manual = self.generator.use_pallas and n_dev > 1
        if manual and (global_batch // n_dev) % self.step_config.batch_split:
            raise ValueError(
                f"manual (shard_map) data parallelism chunks the per-device "
                f"batch {global_batch // n_dev} by batch_split="
                f"{self.step_config.batch_split}, which must divide; retune "
                f"batch_size/batch_split or disable use_pallas"
            )
        step_fn = make_train_step(
            self.generator, self.encoder, self.discriminator, self.step_config,
            axis_name="data" if manual else None,
        )
        if n_dev > 1:
            self._step_fn = compile_train_step(step_fn, self.mesh,
                                               manual=manual)
            self.state = replicate(self.state, self.mesh)
        else:
            self._step_fn = jax.jit(step_fn, donate_argnums=(0,))
            # a previous multi-device stage left the state committed to the
            # old mesh; feeding it to this plain jit would compile a GSPMD
            # program over that mesh (a Mosaic partitioning error under
            # use_pallas, silent redundant execution without) — re-place it
            # on the trimmed mesh's single device
            leaves = jax.tree.leaves(self.state)
            if leaves and isinstance(leaves[0], jax.Array) and len(
                    leaves[0].sharding.device_set) > 1:
                self.state = jax.device_put(
                    jax.device_get(self.state), self.mesh.devices.flat[0])
        # multi-process: the new executable's first run creates gloo
        # communicators (hard 30 s rendezvous) — align it at the first
        # invocation, where the real arguments are available.
        self._step_fn_needs_align = self.process_count > 1 and n_dev > 1
        # steps_per_dispatch chaining: the compiled chain program is built
        # lazily on the first full-length window (it reuses `step_fn`), and
        # is invalidated here alongside the single-step program.
        # _chain_k_req is the curriculum's ask; _chain_k is the effective
        # scan length after the HBM window-size clamp (applied once per
        # stage on the first real batch, when its byte size is known).
        self._chain_k_req = max(
            1, int(self.metadata.get("steps_per_dispatch", 1) or 1))
        self._chain_k = self._chain_k_req
        self._chain_k_clamped = False
        self._chain_epoch_warned = False
        self._chain_fn = None
        self._chain_fn_needs_align = False
        self._chain_step_fn = step_fn
        self._chain_manual = manual

    def _ensure_chain_fn(self):
        """Compile the k-chained step on first use (one extra executable per
        stage; partial windows fall back to the single-step program)."""
        if self._chain_fn is None:
            chained = make_chained_step(self._chain_step_fn)
            if self.mesh.size > 1:
                self._chain_fn = compile_train_step(
                    chained, self.mesh, manual=self._chain_manual,
                    stacked=True,
                )
            else:
                self._chain_fn = jax.jit(chained, donate_argnums=(0,))
            self._chain_fn_needs_align = self.process_count > 1 and (
                self.mesh.size > 1
            )
        return self._chain_fn

    # Stacked-window input budget: a chained dispatch ships k whole batches
    # to the device as one (k, B, ...) argument, and the async pipeline can
    # hold the next window's transfer alongside it — so the guard caps the
    # per-window bytes, not per-batch. Thousand-family batches are a few MB
    # (images + subsampled pcl) and never clamp; the voxel families carry
    # ~100 MB of fp32 volumes per batch at the dg stage-0 shape (batch 24,
    # 64³×4ch) on a part with a documented 144 MB-margin OOM history, so
    # spd 8 would stack ~805 MB — the clamp holds them to ~2 steps, where
    # the dispatch round trip is already noise vs their 1.8 s/step compute.
    # Per-run override: curriculum key `max_chain_window_bytes`.
    _MAX_CHAIN_WINDOW_BYTES = 256 * 1024 * 1024

    def _clamp_chain_k(self, batch: dict) -> None:
        """Once per stage (first real batch), cap steps_per_dispatch so the
        stacked window argument stays under the HBM input budget."""
        self._chain_k_clamped = True
        nbytes = sum(
            np.asarray(v).nbytes for v in batch.values()
            if not isinstance(v, list)
        )
        budget = int(
            self.metadata.get("max_chain_window_bytes", 0)
            or self._MAX_CHAIN_WINDOW_BYTES
        )
        cap = max(1, budget // max(1, nbytes))
        if cap < self._chain_k:
            if self.is_main:
                print(
                    f"steps_per_dispatch {self._chain_k} -> {cap}: window of "
                    f"{self._chain_k} x {nbytes / 2**20:.0f} MB batches "
                    f"exceeds the {budget / 2**20:.0f} MB chained-window "
                    "input budget (max_chain_window_bytes)"
                )
            self._chain_k = cap
            self._chain_fn = None

    def _chain_window(self) -> int:
        """Longest step window [step, step+n) that is safe to dispatch as one
        chained program: no curriculum milestone strictly inside, and no
        freq-gated host action (stats print, sample grids, checkpoint+eval),
        profiler hook, or --stop_step boundary before the window's last step.
        """
        n = self._chain_k
        if n <= 1:
            return 1
        s = self.step
        for m in sorted(k for k in self.curriculum if isinstance(k, int)):
            if s < m < s + n:
                n = m - s
                break
        for freq in (self.args.print_freq, self.args.sampling_interval,
                     self.args.eval_freq):
            if freq and freq > 0:
                # first t >= s whose post-step gate (t+1) % freq == 0 fires
                t = s + (freq - (s + 1) % freq) % freq
                n = min(n, t - s + 1)
        if getattr(self.args, "profile_dir", None):
            for t in (10, 15):  # trace start/stop run before those steps
                if s < t < s + n:
                    n = t - s
        stop = getattr(self.args, "stop_step", None)
        if stop:
            n = min(n, stop + 1 - s)
        return max(1, n)

    def update_metadata(self) -> bool:
        """Refresh per-step hyperparameters; True if anything baked into the
        compiled step (or the dataloader) changed.

        The reference re-applies every metadata field each step
        (train.py:82-88, utils.py:503-544), so a milestone that changes only
        num_steps / z_reg_weight / lr must take effect immediately. Here all
        such fields live in the frozen, comparable TrainStepConfig — comparing
        whole configs (not just batch/img size) is what makes e.g. the
        thousand curriculum's step-25000 num_steps 48→64 transition fire.
        """
        new_meta = extract_metadata(self.curriculum, self.step)
        # dataloader-affecting fields get their own flag: an lr-/num_steps-
        # only milestone must recompile the step but should NOT abandon the
        # rest of the epoch and respawn workers (reference reloads the
        # dataloader only on batch/img changes, train.py:84-88)
        self._data_changed = any(
            new_meta.get(k) != self.metadata.get(k)
            for k in ("batch_size", "img_size", "num_points_ratio",
                      "voxel_resolution")
        ) or new_meta["dataset"] != self.metadata["dataset"]
        changed = (
            self._data_changed
            or self._current_step_config(new_meta) != self.step_config
            # a per-stage steps_per_dispatch change swaps the chained
            # executable (its scan length is baked into the program);
            # compare against the REQUESTED k — the effective _chain_k may
            # have been clamped by the HBM window-size guard
            or max(1, int(new_meta.get("steps_per_dispatch", 1) or 1))
            != self._chain_k_req
        )
        self.metadata = new_meta
        return changed

    # ------------------------------------------------------------------
    # schedules / bookkeeping
    # ------------------------------------------------------------------
    def set_alpha(self) -> None:
        step_last = last_upsample_step(self.curriculum, self.step)
        self.alpha = float(
            fade_alpha(self.step, step_last, self.metadata["fade_steps"])
        )
        self.nerf_noise = float(nerf_noise_schedule(self.step))

    def write_train_settings(self) -> None:
        if not self.is_main:
            return
        out = Path(self.args.output_dir)
        with open(out / "train_spec.txt", "w") as f:
            f.write(str(vars(self.args)))
            f.write("\n\n")
            f.write(str(self.curriculum))
            f.write("\n\n")
            f.write(f"generator: {self.generator}\n")
            if self.discriminator is not None:
                f.write(f"discriminator: {self.discriminator}\n")
            f.write(f"encoder: {self.encoder}\n")
        curriculum_to_json(self.curriculum, out / "curriculum.json")

    def print_stats(self, steps_elapsed_time: float):
        if not (self.is_main and (self.step + 1) % self.args.print_freq == 0):
            return None
        self._flush_metrics()  # histories current through this step
        from tabulate import tabulate

        header = ["Time", "Epoch", "Step", "Sec per step", "Alpha",
                  "Img Size", "Batch Size", "Num steps"]
        row = [
            datetime.now().strftime("%d--%H:%M"),
            self.epoch,
            self.step,
            round(steps_elapsed_time / self.args.print_freq, 3),
            f"{self.alpha:.2f}",
            self.metadata["img_size"],
            self.metadata["batch_size"] * self.process_count,
            self.metadata["num_steps"],
        ]
        if self.metadata["dataset"]["load_voxel"]:
            header.append("Voxel Res.")
            row.append(self.metadata.get("voxel_resolution", 64))
        pairs = [
            ("Photo loss", "photometry_losses"),
            ("Photo loss val", "photometry_losses_val"),
            ("Depth loss val", "depth_losses_val"),
            ("Photo loss test", "photometry_losses_test"),
            ("Depth loss test", "depth_losses_test"),
            ("Depth loss", "depth_losses"),
            ("Loss_G", "generator_losses"),
            ("Loss_D", "discriminator_losses"),
        ]
        for title, key in pairs:
            hist = self.histories[key]
            if hist:
                value = hist[-1][1] if isinstance(hist[-1], (list, tuple)) else hist[-1]
                header.append(title)
                row.append(f"{value:.4f}")
        stats = [header, row]
        print(tabulate(stats, tablefmt="fancy_grid"), flush=True)
        return stats

    # ------------------------------------------------------------------
    # train loop
    # ------------------------------------------------------------------
    def train(self) -> None:
        self.write_train_settings()
        dataloader = self._make_dataloader()
        # resume: put the loader back at the checkpointed epoch and batch
        # offset (the reference restores only the step counter,
        # utils.py:318-319 — its resumed batch sequence silently diverges;
        # here it replays exactly). The jump is free: sample content is a
        # pure function of (seed, epoch, index), so skipped batches are
        # never decoded.
        pending_skip = 0
        if self._restored_loader_state:
            dataloader.epoch = int(self._restored_loader_state["epoch"])
            pending_skip = int(self._restored_loader_state["offset"])
            self._restored_loader_state = None
        # One identical key on every process: the rng input is declared
        # replicated in the jitted step's shardings, and SPMD replication
        # requires replicated inputs to be bitwise equal across processes.
        # Per-sample divergence comes from batch-shaped draws inside the step.
        # Host numpy (not a committed device array) so multi-process jit can
        # broadcast it to the global mesh.
        rng = np.asarray(jax.random.PRNGKey(1000 + getattr(self.args, "seed", 0)))
        steps_elapsed = 0.0

        for _ in range(self.args.n_epochs):
            epoch_start = time.time()
            if self.is_main:
                print(f"---- {self.epoch}_th epoch ----", flush=True)
            restart_epoch = False
            # epoch about to be consumed (DataLoader.__iter__ bumps .epoch)
            self._loader_epoch = dataloader.epoch
            self._batch_offset = pending_skip
            dataloader.start_batch = pending_skip
            pending_skip = 0
            batches_iter = iter(dataloader)
            while True:
                try:
                    batch = next(batches_iter)
                except StopIteration:
                    break
                if self.update_metadata():
                    if self._data_changed:
                        print(f"Metadata updated at step {self.step}. "
                              "Reload dataset.")
                        # release the abandoned iterator's prefetch worker
                        # (a named iterator outlives the break, unlike the
                        # anonymous `for batch in dataloader` one)
                        batches_iter.close()
                        dataloader = self._make_dataloader()
                        self._rebuild_step_fn()
                        restart_epoch = True
                        break
                    # compile-affecting-only change (num_steps / lrs /
                    # z_reg …): swap the compiled step, keep the epoch
                    print(f"Metadata updated at step {self.step}. "
                          "Recompiled train step.")
                    self._rebuild_step_fn()

                self.set_alpha()
                # profiler hook (the reference's vestigial @profile decorators,
                # train.py:57 / utils.py:620, become a real xprof trace here)
                profile_dir = getattr(self.args, "profile_dir", None)
                if profile_dir and self.step == 10:
                    jax.profiler.start_trace(profile_dir)
                if profile_dir and self.step == 15:
                    jax.profiler.stop_trace()
                    print(f"Wrote profiler trace to {profile_dir}")

                # steps_per_dispatch > 1: pull a milestone-/host-action-free
                # window and scan it on-device in ONE dispatch (each dispatch
                # is a host↔device round trip; chaining amortizes it k×).
                # A window the epoch can't fill falls back to the per-step
                # program below, so only one extra executable exists per stage.
                window = []
                if self._chain_k > 1 and not self._chain_k_clamped:
                    self._clamp_chain_k(batch)
                n = self._chain_window()
                if n == self._chain_k and self._chain_k > 1:
                    window = [batch]
                    while len(window) < n:
                        try:
                            window.append(next(batches_iter))
                        except StopIteration:
                            # windows cannot span epochs: a dataset with
                            # fewer batches per epoch than steps_per_dispatch
                            # silently degrades to per-step dispatch — say so
                            # once, it's a real per-step round-trip cost
                            if self.is_main and not self._chain_epoch_warned:
                                self._chain_epoch_warned = True
                                print(
                                    f"steps_per_dispatch {self._chain_k} idle"
                                    f": the epoch ran out after {len(window)}"
                                    f" batch(es) mid-window — epochs need >= "
                                    f"{self._chain_k} batches to chain "
                                    "(tiny dataset? raise multifold or lower "
                                    "steps_per_dispatch)"
                                )
                            break
                if len(window) == self._chain_k and self._chain_k > 1:
                    cont, steps_elapsed = self._run_chained_window(
                        window, rng, steps_elapsed)
                    if not cont:
                        return
                    continue

                for j, b in enumerate(window or [batch]):
                    # dry-epoch fallback: later window steps recompute their
                    # schedules (no milestone sits inside the window, so
                    # update_metadata needn't re-run)
                    if j:
                        self.set_alpha()
                    t0 = time.time()
                    batch_dev = self._put_batch(b)
                    if self._step_fn_needs_align:
                        self._step_fn = compile_aligned(
                            self._step_fn, self.state, batch_dev, rng,
                            np.float32(self.alpha), np.float32(self.nerf_noise),
                        )
                        self._step_fn_needs_align = False
                    self.state, metrics = self._step_fn(
                        self.state, batch_dev, rng,
                        np.float32(self.alpha), np.float32(self.nerf_noise),
                    )
                    # don't sync here: queue the device metrics and let the next
                    # batch's host load + transfer overlap this step's compute.
                    # The recording flags are snapshotted NOW: a milestone can
                    # swap self.metadata before these metrics are flushed, and
                    # recording them under the new flags would drop or KeyError
                    # on losses the old stage did/didn't produce.
                    self._pending_metrics.append(
                        (self.step, metrics, self._record_flags(), 1)
                    )
                    self._flush_metrics(keep=self._MAX_IN_FLIGHT)
                    self._batch_offset += 1
                    if self.is_main and (self.step + 1) % self.args.print_freq == 0:
                        # drain inside the timed region so "Sec per step" counts
                        # the device sync, not just the async dispatch
                        self._flush_metrics()
                    steps_elapsed += time.time() - t0

                    if self.print_stats(steps_elapsed) is not None:
                        steps_elapsed = 0.0
                    self.sample_imgs()
                    self.save_models()
                    self.evaluate()

                    self.step += 1
                    if getattr(self.args, "stop_step", None) and self.step > self.args.stop_step:
                        self._final_checkpoint()
                        return
            if self.is_main and not restart_epoch:
                dt = time.time() - epoch_start
                print(f"{self.epoch}_th epoch runtime: {int(dt//60):02}:{int(dt%60):02}")
            if not restart_epoch:
                self.epoch += 1
        self._final_checkpoint()

    def _final_checkpoint(self) -> None:
        """Always leave a checkpoint at loop exit (the eval_freq-gated save
        can otherwise lose an entire sub-eval_freq run)."""
        self._flush_metrics()
        if self.is_main and not (
            self.checkpoints_path / f"{self.step - 1}.ckpt"
        ).exists():
            print(f"Saving final checkpoint at step {self.step - 1}")
            save_checkpoint(
                self.checkpoints_path, self.step - 1, self.state,
                self._checkpoint_payload(),
            )

    def _put_batch(self, batch: dict) -> dict:
        batch = {k: v for k, v in batch.items() if not isinstance(v, list)}
        if len(self.mesh.devices.flat) > 1:
            return shard_batch(batch, self.mesh)
        return {k: jnp.asarray(v) for k, v in batch.items()}

    def _put_batch_stacked(self, batches: list[dict]) -> dict:
        """Place a steps_per_dispatch window as (k, B, ...) arrays, batch
        axis sharded over the mesh (axis 1 — axis 0 is the scan axis)."""
        stacked = {
            k: np.stack([np.asarray(b[k]) for b in batches])
            for k, v in batches[0].items() if not isinstance(v, list)
        }
        if len(self.mesh.devices.flat) > 1:
            return shard_batch(stacked, self.mesh, batch_axis=1)
        return {k: jnp.asarray(v) for k, v in stacked.items()}

    def _run_chained_window(self, window: list[dict], rng,
                            steps_elapsed: float) -> tuple[bool, float]:
        """Dispatch a full steps_per_dispatch window as ONE scanned program,
        then replay the per-step host bookkeeping (the window construction
        guarantees only its last step can have an armed print/sample/eval
        gate). Returns (keep_training, steps_elapsed).

        Same math and rng draws as the per-step path: the step rng folds on
        state.step inside the program, and the (k,) alpha / nerf-noise
        arrays hold exactly the scalars the unchained loop would pass
        (cross-program results differ only by XLA reassociation — see
        make_chained_step).
        """
        k = len(window)
        t0 = time.time()
        last_up = last_upsample_step(self.curriculum, self.step)
        fade = self.metadata["fade_steps"]
        alphas = np.asarray(
            [float(fade_alpha(self.step + i, last_up, fade)) for i in range(k)],
            np.float32,
        )
        noises = np.asarray(
            [float(nerf_noise_schedule(self.step + i)) for i in range(k)],
            np.float32,
        )
        batch_dev = self._put_batch_stacked(window)
        chain_fn = self._ensure_chain_fn()
        if self._chain_fn_needs_align:
            self._chain_fn = chain_fn = compile_aligned(
                chain_fn, self.state, batch_dev, rng, alphas, noises
            )
            self._chain_fn_needs_align = False
        self.state, metrics = chain_fn(self.state, batch_dev, rng, alphas,
                                       noises)
        self._chain_dispatches += 1
        # one queue entry for the whole window; _flush_metrics fans the
        # stacked (k,) metric arrays back out to per-step history entries
        self._pending_metrics.append(
            (self.step, metrics, self._record_flags(), k)
        )
        for i in range(k):
            self.alpha = float(alphas[i])
            self.nerf_noise = float(noises[i])
            self._flush_metrics(keep=self._MAX_IN_FLIGHT)
            self._batch_offset += 1
            if self.is_main and (self.step + 1) % self.args.print_freq == 0:
                self._flush_metrics()
            if i == k - 1:
                steps_elapsed += time.time() - t0
                if self.print_stats(steps_elapsed) is not None:
                    steps_elapsed = 0.0
            self.sample_imgs()
            self.save_models()
            self.evaluate()
            self.step += 1
            if getattr(self.args, "stop_step", None) and (
                self.step > self.args.stop_step
            ):
                self._final_checkpoint()
                return False, steps_elapsed
        return True, steps_elapsed

    # STEPS allowed in flight before the oldest metrics are forced to
    # materialize. Each in-flight entry pins its device input batches: one
    # batch for a per-step entry, k batches for a chained window. Counting
    # steps (not entries) bounds the pinned input HBM to ~4 batches on the
    # per-step path and to ONE window on the chained path (a k>=4 window
    # alone fills the allowance, so at most the newest window stays queued)
    # while still overlapping the next window's host load with this one's
    # device execution.
    _MAX_IN_FLIGHT = 4

    def _flush_metrics(self, keep: int = 0) -> None:
        """Materialize queued device metrics into histories, oldest first.

        keep > 0 leaves up to that many STEPS in flight — but always at
        least the newest entry, so a chained window wider than `keep` still
        pipelines (the float() of an entry blocks until its step — or whole
        chained window — has executed on the device)."""
        def _pending_steps() -> int:
            return sum(e[3] for e in self._pending_metrics)

        while len(self._pending_metrics) > (1 if keep else 0) and (
            _pending_steps() > keep
        ):
            step_i, m, flags, n = self._pending_metrics.popleft()
            if n == 1:
                self._record({k: float(v) for k, v in m.items()}, step=step_i,
                             flags=flags)
                continue
            # chained window: metrics are (n,)-stacked device arrays
            host = {k: np.asarray(v) for k, v in m.items()}
            for i in range(n):
                self._record({k: float(v[i]) for k, v in host.items()},
                             step=step_i + i, flags=flags)

    def _record_flags(self) -> dict:
        """The metadata flags _record consults, captured at enqueue time."""
        return {
            "enable_discriminator": self.metadata["enable_discriminator"],
            "photo_loss": self.metadata["photo_loss"],
            "depth_loss": self.metadata.get("depth_loss"),
            "load_pcl": self.metadata["dataset"]["load_pcl"],
        }

    def _record(self, metrics: dict, step: int | None = None,
                flags: dict | None = None) -> None:
        step = self.step if step is None else step
        flags = self._record_flags() if flags is None else flags
        # z_reg progress print every 100 steps (reference utils.py:696-698)
        if (
            self.is_main and "z_reg" in metrics
            and flags["load_pcl"] and step % 100 == 0
        ):
            print("z_reg: ", metrics["z_reg"], flush=True)
        if "d_loss" in metrics:
            self.histories["discriminator_losses"].append(metrics["d_loss"])
        if flags["enable_discriminator"]:
            self.histories["generator_losses"].append(metrics["g_loss"])
        if flags["photo_loss"]:
            self.histories["photometry_losses"].append(metrics["photo_loss"])
        if flags["depth_loss"]:
            self.histories["depth_losses"].append(metrics["depth_loss"])

    # ------------------------------------------------------------------
    # eval-time rendering helpers
    # ------------------------------------------------------------------
    def _eval_metadata(self, img_size=None, num_steps=None) -> dict:
        meta = copy.deepcopy(self.metadata)
        # sample/eval render resolution (reference hardcodes 128²/48,
        # utils.py:871-874; curriculum-tunable here for small smoke runs)
        meta["img_size"] = img_size or self.metadata.get("sample_img_size", 128)
        meta["num_steps"] = num_steps or self.metadata.get("sample_num_steps", 48)
        meta["nerf_noise"] = 0
        meta["last_back"] = meta.get("eval_last_back", False)
        return meta

    def _local_params(self, name: str):
        """Process-local copy of a param subtree for eval-time rendering.

        Training params are global arrays spanning every process's devices;
        eval renders are per-process *independent* programs over different
        data shards (fid_evaluation.output_images), so they must not close
        over global arrays — each process pulls a host copy and runs on its
        own devices (the DDP analogue: each rank renders its shard on its own
        GPU, reference fid_evaluation.py:103-151). The same applies on a
        single-process >1-device mesh: the replicated params are committed
        to the whole mesh, and feeding them to the plain-jit eval render
        would produce a multi-device GSPMD program — which cannot contain
        the Mosaic (use_pallas) kernel. Pulling a host copy pins the eval
        program to one device either way.
        """
        params = getattr(self.state, name)
        if self.process_count > 1 or self.mesh.size > 1:
            # one transfer per (step, state) — eval loops (FID output_images)
            # call this per rendered batch with unchanged params. The cached
            # copy is re-committed to this process's first device: caching
            # the host numpy instead would make every jit dispatch re-upload
            # the whole tree through the remote-TPU tunnel (the device_get
            # is amortized but an uncommitted-numpy device_put is not).
            key = (self.step, self._state_version)
            if self._host_params_cache.get("key") != key:
                self._host_params_cache = {"key": key}
            if name not in self._host_params_cache:
                self._host_params_cache[name] = jax.device_put(
                    jax.device_get(params), jax.local_devices()[0]
                )
            params = self._host_params_cache[name]
        return params

    def encode_batch(self, batch: dict):
        """Gradient-free conditioning encode (eval path)."""
        fn = self._render_cache.get("encode")
        if fn is None:
            if self.metadata["dataset"]["load_pcl"]:
                def fn(params, b):
                    z, _ = encode_pcl(
                        lambda p, x: self.encoder.apply(p, x), params, b["pcl"],
                    )
                    return z
            else:
                def fn(params, b):
                    z = self.encoder.apply(params, b["voxel"])
                    return tuple(z) if isinstance(z, list) else z
            fn = jax.jit(fn)
            self._render_cache["encode"] = fn
        return fn(self._local_params("params_E"), batch)

    def generate_img(self, z, cam2world, img_size=None, num_steps=None):
        """Deterministic render at eval settings (reference utils.py:60-82)."""
        meta = self._eval_metadata(img_size, num_steps)
        key = ("render", meta["img_size"], meta["num_steps"])
        fn = self._render_cache.get(key)
        if fn is None:
            cfg = RenderConfig.from_metadata(meta, perturb=False)
            # eval renders use the SAME generator (and hence the same
            # use_pallas resolution) as the train step: metrics must
            # measure the forward the losses were trained through, not a
            # differently-rounded one. The thousand preset defaults the
            # fused kernel on for both; the kernel additionally self-gates
            # on TPU + the bf16/fast-sin policy, so this is a no-op for
            # fp32 or CPU runs.
            fn = jax.jit(
                lambda p, zz, cc: self.generator.apply(p, zz, cc, cfg,
                                                       rng=None)
            )
            self._render_cache[key] = fn
        return fn(self._local_params("params_G"), z, cam2world)

    def sample_imgs(self) -> None:
        """Dump GT/generated rgb+depth grids (utils.py:844-915)."""
        if (self.step + 1) % self.args.sampling_interval != 0:
            return
        if self.is_main:
            self._flush_metrics()  # keep history order: train losses first
            for dataset, path, label in (
                (self.trainset, self.samples_train_path, "train"),
                (self.valset, self.samples_val_path, "val"),
                (self.testset, self.samples_test_path, "test"),
            ):
                self._sample_from_cameras(dataset, path)
            self.val_loss(self.valset, "photometry_losses_val",
                          "depth_losses_val")
            self.val_loss(self.testset, "photometry_losses_test",
                          "depth_losses_test")
        # same shape as evaluate_trainer's third barrier: the main process
        # just spent well over the 30 s gloo rendezvous window rendering
        # grids and val losses — without this the other processes' next
        # train-step collective times out waiting for it
        sync_processes("sample_imgs_done")

    def _sample_from_cameras(self, dataset, save_dir, num_imgs: int = 12) -> None:
        num_imgs = min(num_imgs, len(dataset))
        ray_end = self.metadata["ray_end"]
        # grid selection is a pure function of (seed, step, dataset size):
        # reproducible across runs AND resume-invariant (a resumed run picks
        # the same grid the uninterrupted run would have — the reference
        # seeds the global stream per-rank, train.py:71-72, which is
        # reproducible but drifts after a resume)
        grid_rng = random.Random(
            f"{getattr(self.args, 'seed', 0)}/{self.step}/{len(dataset)}"
        )
        indices = grid_rng.sample(range(len(dataset)), num_imgs)
        samples = [dataset[i] for i in indices]
        # one batched render (the reference loops B=1, utils.py:885-909 —
        # per-dispatch latency dominates on a tunnelled TPU)
        batch = {
            k: jnp.asarray(np.stack([s[k] for s in samples]))
            for k in ("pcl", "voxel", "cam2world")
            if k in samples[0]
        }
        z = self.encode_batch(batch)
        rgb, depth = self.generate_img(z, batch["cam2world"])
        rgb = np.asarray(rgb)
        depth = np.asarray(depth)

        rows_gt, rows_gt_depth, rows_gen, rows_gen_depth = [], [], [], []
        for row, sample in enumerate(samples):
            rows_gt.append(sample["img"] * 0.5 + 0.5)
            gt_depth = sample.get("depth")
            if gt_depth is None:
                gt_depth = np.zeros(sample["img"].shape[:2], np.float32)
            rows_gt_depth.append(
                np.repeat((gt_depth / ray_end)[..., None], 3, axis=-1)
            )
            rows_gen.append(rgb[row] * 0.5 + 0.5)
            rows_gen_depth.append(
                np.repeat((depth[row] / ray_end)[..., None], 3, axis=-1)
            )
        # depth rows are 128² like the GT rgb; resize GT to match gen if needed
        target = rows_gen[0].shape[0]
        import cv2

        def fit(img):
            if img.shape[0] != target:
                img = cv2.resize(img, (target, target), interpolation=cv2.INTER_AREA)
            return img.astype(np.float32)

        grid = [fit(x) for x in rows_gt + rows_gt_depth + rows_gen + rows_gen_depth]
        save_image_grid(grid, save_dir / f"{self.step:06}.png", nrow=num_imgs)

    def val_loss(self, dataset, photo_key: str, depth_key: str,
                 batch_size: int = 8) -> None:
        """Fixed-index val/test losses (utils.py:917-972).

        Renders in batches (the reference loops B=1 through a DataLoader,
        utils.py:918-933 — per-dispatch latency makes that painful on TPU).
        """
        num_imgs = min(self.metadata.get("val_num_imgs", 48), len(dataset))
        batch_size = min(batch_size, num_imgs)
        num_imgs -= num_imgs % batch_size  # drop_last, as the reference does
        photo_total, depth_total = 0.0, 0.0
        for start in range(0, num_imgs, batch_size):
            samples = [dataset[i] for i in range(start, start + batch_size)]
            batch = {
                k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in ("pcl", "voxel", "cam2world", "img", "depth")
                if k in samples[0]
            }
            z = self.encode_batch(batch)
            rgb, depth = self.generate_img(z, batch["cam2world"])
            photo_total += float(
                jnp.mean((batch["img"] - rgb) ** 2, axis=(1, 2, 3)).sum()
            )
            if "depth" in batch:
                gt = batch["depth"]
                mask = gt != 0
                per_img = jnp.sum(
                    jnp.where(mask, (gt - depth) ** 2, 0.0), axis=(1, 2)
                ) / jnp.maximum(mask.sum(axis=(1, 2)), 1)
                depth_total += float(per_img.sum())
        self.histories[photo_key].append([self.step, photo_total / num_imgs])
        self.histories[depth_key].append([self.step, depth_total / num_imgs])

    # ------------------------------------------------------------------
    # persistence / evaluation
    # ------------------------------------------------------------------
    def _checkpoint_payload(self) -> dict:
        return {
            **self.histories,
            "loader_state": {"epoch": self._loader_epoch,
                             "offset": self._batch_offset},
        }

    def save_models(self) -> None:
        if self.is_main and (self.step + 1) % self.args.eval_freq == 0:
            self._flush_metrics()  # checkpoints persist the histories
            print(f"Saving checkpoint at step {self.step}")
            save_checkpoint(
                self.checkpoints_path, self.step, self.state,
                self._checkpoint_payload(),
            )

    def evaluate(self) -> None:
        """FID / oFID / LPIPS / PSNR eval every eval_freq (utils.py:974-1016)."""
        if (self.step + 1) % self.args.eval_freq != 0:
            return
        self._flush_metrics()
        try:
            from ..eval import evaluate_trainer
        except ImportError:
            return
        meta = self._eval_metadata(img_size=128, num_steps=96)
        results = evaluate_trainer(self, meta)
        if self.is_main and results is not None:
            fid, ofid, lpips_score, psnr = results
            self.histories["fid_history"].append(
                [self.step, fid, ofid, lpips_score, psnr]
            )
            from ..eval.fid_evaluation import append_fid_line

            append_fid_line(
                Path(self.args.output_dir) / "fid.txt",
                self.step, fid, ofid, lpips_score, psnr,
            )
            print(
                f"Metrics at step {self.step}: FID {fid} | oFID {ofid} | "
                f"LPIPS {lpips_score} | PSNR {psnr}",
                flush=True,
            )
