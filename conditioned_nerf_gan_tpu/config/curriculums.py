"""Dict-based curriculum system.

Parity target: reference configs/curriculums.py:84-152 and the curriculum
loading precedence of reference utils.py:191-228 / train.py:218-223.

Schema: integer keys are upsample milestones whose dicts override the
step-dependent hyperparameters (batch_size, img_size, num_steps, batch_split,
lrs, num_points_ratio, voxel_resolution, z_reg_weight); string keys are
globals. `extract_metadata(curriculum, step)` resolves the highest milestone
<= step plus all globals. Presets overlay as default ∘ special ∘ --config via
recursive deep-merge, and the resolved curriculum JSON round-trips with
integer keys restored (reference utils.py:39-50).

Every curriculum key is documented in `CURRICULUM_KEY_DOCS` below (the
reference's 75-line docstring, configs/curriculums.py:5-79, as a registry the
tests can diff against actual consumption).

Deliberately resolved reference inconsistencies (SURVEY.md §2.3):
  * the default config base is the runnable "thousand" package (the reference
    CLI defaulted to a nonexistent `configs.thesis`);
  * stale experiment siren names (TALLSIREN_dg / SHORTSIREN_dg /
    DoubleSIREN_dg) are aliased to the renamed classes in `presets.ALIASES`;
  * hard-coded cluster paths are environment-overridable.
"""

from __future__ import annotations

import copy
import importlib
import json
from pathlib import Path

#: Meaning of every curriculum key — the reference documents its keys in a
#: 75-line module docstring (configs/curriculums.py:5-79); here the docs are a
#: machine-checkable registry: tests/test_config.py asserts every key consumed
#: by the package or shipped in a preset is documented, and every documented
#: key is still in use (drift test, both directions). Nested block keys use
#: "block.key" form. Keys marked [TPU] have no reference counterpart; keys
#: marked [inert] are carried for reference-curriculum parity but are not
#: consumed by this rebuild (most were already inert upstream).
CURRICULUM_KEY_DOCS: dict[str, str] = {
    # -- stage keys (int-keyed milestone dicts override these per stage) -----
    "batch_size": "per-process batch size; a multi-device mesh shards it across devices (the reference's per-GPU batch, curriculums.py doc)",
    "num_steps": "samples along each ray (doubled by hierarchical sampling)",
    "img_size": "rendered/trained image resolution (recompiles the step at milestones)",
    "batch_split": "gradient-accumulation splits per step (memory knob; see grad_accum_scale for the effective-gradient semantics)",
    "gen_lr": "generator Adam learning rate",
    "disc_lr": "discriminator Adam learning rate (default: gen_lr)",
    "enc_lr": "encoder Adam learning rate (default: gen_lr)",
    "num_points_ratio": "fraction of the point cloud kept when the dataset subsamples pcl_color.npy",
    "voxel_resolution": "input voxel grid resolution loaded by the dataset (32/64/128)",
    # -- NeRF / camera ------------------------------------------------------
    "fov": "camera field of view in degrees",
    "ray_start": "near clipping distance for camera rays",
    "ray_end": "far clipping distance for camera rays",
    "cam_r_start": "minimum sampled camera distance from the origin",
    "cam_r_end": "maximum sampled camera distance from the origin",
    "hierarchical_sample": "enable NeRF importance resampling (doubles point count)",
    "clamp_mode": "density activation before integration: relu | softplus",
    "last_back": "fill background with the last sample's color on each ray",
    "white_back": "composite onto a white background",
    "fill_mode": "post-integration fill: debug (magenta fg) | weight (weight-sum gray) | None",
    "perturb": "stratified jitter of the coarse z samples (training on; eval renders pass False)",
    "nerf_noise": "density-noise stddev override (eval paths pin 0; during training it is the max(0, 1-step/5000) schedule, a traced scalar)",
    "h_stddev": "[inert] camera yaw stddev — the thesis path samples uniformly over the hemisphere; kept (and zeroed by inference) for checkpoint-curriculum parity",
    "v_stddev": "[inert] camera pitch stddev — see h_stddev",
    "h_mean": "[inert] camera yaw mean — see h_stddev",
    "v_mean": "[inert] camera pitch mean — see h_stddev",
    "sample_dist": "[inert] camera-distribution name of upstream pi-GAN's sampler (the rebuild's sampler is the thesis hemisphere rule)",
    "lock_view_dependence": "[inert] upstream pi-GAN flag (no SIREN variant here consumes ray directions)",
    "learnable_dist": "[inert] reference flag for a learned camera distribution (unused upstream too)",
    "psi": "[inert] truncation-trick psi (reference generate_avg_frequencies path is unused in the main flow; inference pins 1)",
    # -- training -----------------------------------------------------------
    "fade_steps": "discriminator fade-in window after an upsample milestone (alpha schedule)",
    "betas": "Adam beta parameters for all three optimizers",
    "weight_decay": "coupled L2 weight decay on all optimizers",
    "r1_lambda": "R1 gradient-penalty weight on the discriminator's real logits",
    "grad_clip": "global-norm gradient clip applied before each Adam update",
    "discriminator": "discriminator registry name (ProgressiveDiscriminator | ...Encoder... | ..._inputCat | ..._projection | legacy pi-GAN names)",
    "enable_discriminator": "False trains generator-only (no GAN loss, no D params/optimizer)",
    "noise_weight": "stddev of the Gaussian noise blended into the encoded pcl latent (encode_pcl)",
    "dropout_ratio": "dropout ratio inside FiLM layers (generator.drop_out default)",
    "random_gen_img": "True: render fake images from freshly sampled cameras; False: reuse the batch's GT cameras",
    "num_workers": "[inert] torch DataLoader worker count — the rebuild prefetches on a thread (or the C++ pool via --native_loader)",
    "unique_lr": "[inert] upstream pi-GAN reduced-mapping-lr flag; superseded by mapping_lr_mult",
    "topk_interval": "[inert] upstream pi-GAN top-k fade interval (top-k training is not part of the thesis path)",
    "topk_v": "[inert] upstream pi-GAN minimum top-k fraction — see topk_interval",
    # -- losses -------------------------------------------------------------
    "photo_loss": "enable photometric MSE between renders and GT views",
    "depth_loss": "enable foreground-masked depth MSE",
    "depth_loss_weight": "weight of the depth loss term",
    "z_reg_weight": "weight of the encoded-latent norm regularizer (pointnet l_reg)",
    "geo_loss": "[inert] legacy geometry loss flag (reference loss_geometry, legacy experiments only)",
    "z_lambda": "[inert] upstream pi-GAN latent positional-consistency weight",
    "pos_lambda": "[inert] upstream pi-GAN positional-consistency weight",
    "latent_dim": "[inert] upstream pi-GAN alias of generator.z_dim (carla preset carries it)",
    "model": "[inert] upstream pi-GAN model name tag (carla preset carries it)",
    "z_dist": "latent prior for unconditional sampling: gaussian | uniform (losses.sample_z)",
    # -- generator block ----------------------------------------------------
    "generator": "generator hyperparameter block (see generator.* keys)",
    "generator.siren_type": "SIREN registry name (SHORTSIREN, TALLSIREN, *_FG family, ... — models/siren.py SIREN_REGISTRY)",
    "generator.z_dim": "latent / global-feature dimension",
    "generator.input_dim": "SIREN input dimension (3 = xyz; FG variants override with the sampled feature width)",
    "generator.output_dim": "SIREN output dimension (4 = rgb + sigma)",
    "generator.hidden_dim": "SIREN hidden width",
    "generator.drop_out": "FiLM-layer dropout (default: top-level dropout_ratio)",
    "generator.mapping_network": "mapping-network registry name (CustomMappingNetwork | LongMappingNetwork | ...)",
    # -- encoder (unet) block ------------------------------------------------
    "unet": "3D U-Net encoder block (see unet.* keys; used when dataset.load_voxel)",
    "unet.type": "U-Net variant: UNet3D | PyramidUNet3D | ResidualUNet3D",
    "unet.in_channels": "input volume channels (4 = occupancy + rgb)",
    "unet.out_channels": "output feature-volume channels",
    "unet.f_maps": "feature maps per level (int => geometric progression)",
    "unet.num_levels": "encoder/decoder depth",
    "unet.final_sigmoid": "sigmoid on the final conv (else softmax when is_segmentation)",
    "unet.is_segmentation": "segmentation-head semantics for the final activation",
    "unet.return_global": "also return a global feature (avg-pooled bottleneck)",
    # -- dataset block ------------------------------------------------------
    "dataset": "dataset block (see dataset.* keys); the reference also used a top-level string naming the Dataset class — the rebuild is ShapeNet-only",
    "dataset.path": "root of the prepared ShapeNet tree (env CNG_DATASET_PATH overrides)",
    "dataset.trainset": "trainset .lst mode (thousand | twenty | single | ...)",
    "dataset.testset": "testset .lst mode under test/",
    "dataset.load_voxel": "load voxel grids and condition through the 3D U-Net",
    "dataset.load_pcl": "load colored point clouds and condition through PointNet",
    "dataset.load_depth": "load EXR depth maps (forced on by depth_loss)",
    "dataset.cond_mode": "conditioning-view selection: random | nearest | furthest (inputCat/projection discriminators)",
    "dataset.voxel_resolution": "per-preset voxel resolution override (same meaning as the top-level key)",
    # -- eval / fid block ----------------------------------------------------
    "fid": "evaluation block (see fid.* keys)",
    "fid.subset": "dataset .lst mode rendered for FID (reference fid_evaluation.py:95)",
    "fid.target_size": "FID image resolution (128 in the protocol)",
    "fid.render_batch": "[TPU] eval render batch size override — per-dispatch latency dominates on a tunnelled TPU, so batching beats the reference's VRAM-bound 2/8 rule",
    "sample_img_size": "sample-grid render resolution (reference hardcodes the stage img_size)",
    "sample_num_steps": "ray samples for sample-grid renders (default 48)",
    "val_num_imgs": "images per val/test loss pass (reference fixed indices, utils.py:927-930)",
    "eval_last_back": "last_back override for eval renders (reference generate_img forces last_back at eval, utils.py:64)",
    # -- TPU-native knobs (no reference counterpart) -------------------------
    "compute_dtype": "[TPU] matmul compute dtype policy, e.g. 'bfloat16' (params/grads/sin epilogues stay fp32); the bf16 analogue of the reference's fp16 AMP",
    "use_fast_sin": "[TPU] polynomial sin approximation in SIREN layers (~3e-6 max err, ops/fastmath.py)",
    "use_pallas": "[TPU] fused FiLM-SIREN point-eval Pallas kernel (self-gates on TPU + bf16 + fast_sin; forces the manual shard_map step on multi-device meshes)",
    "ray_chunks": "[TPU] rematerialized ray-chunked rendering: >1 splits img_size² rays into chunks, trading recompute for HBM (the reference's batch_split analogue on the ray axis)",
    "steps_per_dispatch": "[TPU] scan k train steps into one dispatched program (amortizes the per-dispatch host↔device round trip k×; identical math/rng draws — float-reassociation-level drift vs the per-step program only — windows auto-trim at curriculum milestones and print/sample/eval boundaries; per-stage overridable, default 1)",
    "max_chain_window_bytes": "[TPU] HBM input budget for one chained (steps_per_dispatch) window: k is clamped per stage so the stacked (k,B,...) batch argument stays under this many bytes (default 256 MiB — never binds on the few-MB thousand batches, holds the ~100 MB/batch voxel families to ~2 chained steps)",
    "multifold": "[TPU] override the train-list replication factor (reference datasets.py:239-241 hardcodes x3000 for the twenty/single subsets, x1 otherwise); chained steps_per_dispatch windows cannot span epochs, so small custom datasets need epochs of >= k batches to chain — raise this instead of lowering k",
    "density_noise": "[TPU] static gate for the density-noise rng; the trainer clears it per stage once the noise schedule hits 0 so late stages skip dead threefry work",
    "save_siren_outputs": "[TPU] save SIREN eval outputs across the ray-chunk remat instead of replaying the kernels in the backward (measured neutral; tested dead lever)",
    "grad_accum_scale": "[TPU] effective-gradient scale: grad = grad_accum_scale × full-batch mean (default batch_split, the reference's sum-of-split-means semantics) — lets presets retune batch_split without changing dynamics",
    "mapping_lr_mult": "[TPU] mapping-network lr multiplier (upstream pi-GAN's 5e-2 trick as a real knob; the reference's branch never fires, so parity default is 1.0)",
}


def extract_metadata(curriculum: dict, current_step: int) -> dict:
    """Resolve per-step hyperparameters (curriculums.py:120-134)."""
    out: dict = {}
    int_keys = sorted((k for k in curriculum if isinstance(k, int)), reverse=True)
    for key in int_keys:
        if key <= current_step:
            out.update(curriculum[key])
            break
    for key in curriculum:
        if not isinstance(key, int):
            out[key] = curriculum[key]
    return out


def next_upsample_step(curriculum: dict, current_step: int) -> float:
    """First future milestone that increases img_size (curriculums.py:84-94)."""
    current_size = extract_metadata(curriculum, current_step)["img_size"]
    for step in sorted(k for k in curriculum if isinstance(k, int)):
        if step > current_step and curriculum[step].get("img_size", 512) > current_size:
            return step
    return float("inf")


def last_upsample_step(curriculum: dict, current_step: int) -> int:
    """Start step of the current resolution stage (curriculums.py:97-108)."""
    current_size = extract_metadata(curriculum, current_step)["img_size"]
    for step in sorted(k for k in curriculum if isinstance(k, int)):
        if step <= current_step and curriculum[step].get("img_size") == current_size:
            return step
    return 0


def update_recursive(dict1: dict, dict2: dict) -> dict:
    """Deep-merge dict2 into dict1 (curriculums.py:137-152)."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {}
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v
    return dict1


def json_keys_to_int(x):
    """Restore integer milestone keys after a JSON round-trip (utils.py:39-50)."""
    def to_int(y):
        if isinstance(y, int):
            return y
        return int(y) if isinstance(y, str) and y.isdigit() else y

    if isinstance(x, dict):
        return {to_int(k): v for k, v in x.items()}
    return x


def curriculum_to_json(curriculum: dict, path: str | Path) -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(curriculum, f, ensure_ascii=False, indent=4, default=str)


def curriculum_from_json(path: str | Path) -> dict:
    with open(path, "r") as f:
        return json.load(f, object_hook=json_keys_to_int)


def get_config_base(name: str = "thousand"):
    """Import a preset package exposing `default`, `special`, and experiments."""
    return importlib.import_module(
        f"conditioned_nerf_gan_tpu.config.presets.{name}"
    )


def load_curriculum(
    output_dir: str | Path | None = None,
    load_dir: str | Path | None = None,
    load_curriculum_path: str | Path | None = None,
    config_base: str = "thousand",
    config: str | None = None,
) -> dict:
    """Curriculum loading with the reference's precedence (utils.py:191-228):

    1. explicit --load_curriculum JSON
    2. <output_dir>/curriculum.json (Slurm-requeue resume)
    3. <load_dir>/../../curriculum.json (checkpoint's saved curriculum)
    4. preset overlay chain: base.default ∘ base.special ∘ base.<config>
    """
    if load_curriculum_path:
        return curriculum_from_json(load_curriculum_path)
    if output_dir and (Path(output_dir) / "curriculum.json").exists():
        return curriculum_from_json(Path(output_dir) / "curriculum.json")
    if load_dir and (Path(load_dir).parent.parent / "curriculum.json").exists():
        return curriculum_from_json(Path(load_dir).parent.parent / "curriculum.json")

    base = get_config_base(config_base)
    curriculum = update_recursive(
        copy.deepcopy(base.default), copy.deepcopy(base.special)
    )
    if config:
        curriculum = update_recursive(
            curriculum, copy.deepcopy(getattr(base, config))
        )
    return curriculum
