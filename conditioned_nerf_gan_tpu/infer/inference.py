"""Inference runtime.

Parity target: reference inference.py:90-834 (`Inferencer`) —
  * checkpoint + curriculum loading with eval overrides (num_steps =
    48 × multiplier, zero camera stddevs, zero nerf noise / latent noise,
    int keys resolved at the checkpoint step): inference.py:143-175
  * image grids from fixed dataset cameras (with Rodrigues-perturbed
    extrinsics) or uniform spherical cameras: inference.py:194-340
  * orbit videos with the scripted theta/phi/r/fov trajectory:
    inference.py:387-499 — the per-frame fov sweep is a *traced* scalar here,
    so the whole video renders from one compiled function
  * colored-pcl export via depth backprojection → .obj: inference.py:501-601
    (the 2.1875 back-projection constant is computed from the fov —
    1/tan(fov/2) — instead of hard-coded)
  * density-voxel export → .mrc: inference.py:342-385
  * metrics: inference.py:695-729
  * latent/feature-volume interpolation: inference.py:731-834 (the reference
    hard-codes a cluster camera path; here the camera comes from the dataset)

Deliberate fix (SURVEY §2.3): the reference always builds the U-Net encoder
at inference even for PointNet-conditioned checkpoints; here the encoder
follows the curriculum's load_pcl/load_voxel, matching training.
"""

from __future__ import annotations

import copy
import math
import random
from datetime import datetime
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

from ..config import extract_metadata, curriculum_from_json, load_curriculum
from ..data import ShapeNetDataset
from ..models import ImplicitGenerator3d, ResnetPointnet, make_discriminator, make_unet
from ..models.generator import RenderConfig
from ..models.pointnet import encode_pcl
from ..ops import create_cam2world_matrix, sample_camera_positions
from ..training.checkpoints import restore_checkpoint
from ..training.train_step import TrainStepConfig, create_train_state
from ..utils import save_image_grid
from .extract_shapes import sample_sigma_grid
from .mrc import write_mrc


def clip_norm(x: np.ndarray, lower: float = 0.7, upper: float = 1.5) -> np.ndarray:
    norm = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / norm * np.clip(norm, lower, upper)


def perturb_extrinsics(cams: np.ndarray, noise_weight: float,
                       rng: np.random.Generator | None = None) -> np.ndarray:
    """Rodrigues-perturb camera rotations/origins, re-aimed at the world
    origin (reference inference.py:65-87)."""
    import cv2

    rng = rng or np.random.default_rng()
    out = []
    for P in cams:
        R = P[:3, :3].astype(np.float64)
        t = P[:3, -1].astype(np.float64)
        rvec = cv2.Rodrigues(R)[0]
        new_R = cv2.Rodrigues(rvec + rng.normal(size=rvec.shape) * noise_weight)[0]
        new_t = clip_norm(t + rng.normal(size=t.shape) * noise_weight)
        new_t = -new_R[:, -1] * np.linalg.norm(new_t)
        newP = np.eye(4)
        newP[:3, :3] = new_R
        newP[:3, -1] = new_t
        out.append(newP)
    return np.stack(out).astype(np.float32)


class Inferencer:
    def __init__(
        self,
        checkpoint_path: str | Path,
        sampling_mode: str = "val",
        input_voxel_resolution: int = 64,
        z_up: bool = False,
        num_imgs: int = 8,
        image_size: int = 128,
        ray_step_multiplier: int = 1,
        load_dataset: bool = True,
        seed: int = 0,
        shard_rays: bool = False,
    ):
        # shard_rays: split each render's pixel rows over all local devices
        # (parallel/render.py) — profitable for big single-image renders
        self.checkpoint_path = Path(checkpoint_path)
        self.shard_rays = shard_rays
        self.num_imgs = num_imgs
        self.image_size = image_size
        self.ray_step_multiplier = ray_step_multiplier
        self.up_direction = "z" if z_up else "y"
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.step = int(self.checkpoint_path.stem)
        self.run_dir = self.checkpoint_path.parent.parent
        self.curriculum = self._get_curriculum(input_voxel_resolution)
        self._set_models()
        self._render_cache: dict = {}
        if load_dataset:
            ds = self.curriculum["dataset"]
            self.valset = ShapeNetDataset(
                ds["path"], image_size, sampling_mode, self.curriculum,
                load_voxel=ds["load_voxel"], load_pcl=ds["load_pcl"],
                dataset_mode="test", shuffle=True,
                voxel_resolution=self.curriculum["voxel_resolution"],
                load_depth=True, seed=seed,
            )
            self.fidset = ShapeNetDataset(
                ds["path"], self.curriculum["fid"]["target_size"],
                self.curriculum["fid"]["subset"], self.curriculum,
                load_voxel=ds["load_voxel"], load_pcl=ds["load_pcl"],
                dataset_mode="test", load_img=False, load_depth=False,
                shuffle=False,
            )
        # duck-typing for eval.fid_evaluation
        self.is_main = True
        self.process_index = 0
        self.process_count = 1

    # ------------------------------------------------------------------
    def _get_curriculum(self, input_voxel_resolution: int) -> dict:
        path = self.run_dir / "curriculum.json"
        if path.exists():
            print("Loading curriculum from", path)
            curriculum = curriculum_from_json(path)
        else:
            print("Creating curriculum from the thousand preset chain")
            curriculum = load_curriculum(config_base="thousand")
        meta = extract_metadata(curriculum, self.step)
        meta["voxel_resolution"] = input_voxel_resolution
        meta["num_steps"] = int(48 * self.ray_step_multiplier)
        meta["img_size"] = self.image_size
        meta["psi"] = 1
        meta["v_stddev"] = 0
        meta["h_stddev"] = 0
        meta["last_back"] = meta.get("eval_last_back", False)
        meta["nerf_noise"] = 0
        meta["noise_weight"] = 0
        return meta

    def _set_models(self) -> None:
        meta = self.curriculum
        gen_meta = meta["generator"]
        # same bf16 compute policy as training (params are fp32 either way;
        # bf16 matmuls + fp32 sin drift ~1e-7 at trained weight scales)
        dtype_name = meta.get("compute_dtype")
        compute_dtype = jnp.dtype(dtype_name) if dtype_name else None
        self.generator = ImplicitGenerator3d(
            siren_type=gen_meta["siren_type"],
            z_dim=gen_meta["z_dim"],
            input_dim=gen_meta.get("input_dim", 3),
            output_dim=gen_meta.get("output_dim", 4),
            hidden_dim=gen_meta.get("hidden_dim", 256),
            drop_out=gen_meta.get("drop_out",
                                  meta.get("dropout_ratio", 0)),
            mapping_network=gen_meta.get("mapping_network",
                                         "CustomMappingNetwork"),
            compute_dtype=compute_dtype,
            use_fast_sin=meta.get("use_fast_sin", False),
            # same resolution as the Trainer (default off, thousand preset
            # pins it on): inference must render the exact forward the
            # checkpoint was trained through, so the default follows the
            # training-time default rather than always-on. The kernel
            # additionally self-gates on TPU + the bf16/fast-sin policy.
            use_pallas=meta.get("use_pallas", False),
        )
        ds = meta["dataset"]
        if ds["load_voxel"]:
            self.encoder = make_unet(dtype=compute_dtype, **meta["unet"])
        elif ds["load_pcl"]:
            self.encoder = ResnetPointnet(c_dim=gen_meta["z_dim"],
                                          dtype=compute_dtype)
        else:
            raise ValueError("curriculum must enable load_pcl or load_voxel")
        discriminator = (
            make_discriminator(meta["discriminator"])
            if meta.get("enable_discriminator", True) else None
        )

        # rebuild a structurally-identical TrainState and restore into it
        cfg = TrainStepConfig.from_metadata(meta)
        B = 1
        batch = {"cam2world": jnp.broadcast_to(jnp.eye(4), (B, 4, 4))}
        if ds["load_pcl"]:
            batch["pcl"] = jnp.zeros((B, 64, 6))
        else:
            R = meta["voxel_resolution"]
            batch["voxel"] = jnp.zeros((B, R, R, R, meta["unet"]["in_channels"]))
        template = jax.jit(
            lambda k, b: create_train_state(
                k, self.generator, self.encoder, discriminator, b, cfg
            )
        )(jax.random.PRNGKey(0), batch)
        # params_only: inference needs no optimizer state, and this keeps
        # old checkpoints loadable across optax-chain changes
        state, _ = restore_checkpoint(self.checkpoint_path, template,
                                      params_only=True)
        self.params_G = state.params_G
        self.params_E = state.params_E

    # ------------------------------------------------------------------
    # rendering helpers (cached jit, fov traced)
    # ------------------------------------------------------------------
    def encode(self, sample_batch: dict):
        # jitted + cached per input shape: eager dispatch through the TPU
        # tunnel is pathologically slow (CLAUDE.md), and eval calls this with
        # a handful of batch shapes at most
        if self.curriculum["dataset"]["load_pcl"]:
            pcl = jnp.asarray(sample_batch["pcl"])
            key = ("encode_pcl", pcl.shape)
            fn = self._render_cache.get(key)
            if fn is None:
                def fn(p, x):
                    z, _ = encode_pcl(
                        lambda pp, xx: self.encoder.apply(pp, xx), p, x
                    )
                    return z
                fn = jax.jit(fn)
                self._render_cache[key] = fn
            return fn(self.params_E, pcl)
        vox = jnp.asarray(sample_batch["voxel"])
        key = ("encode_voxel", vox.shape)
        fn = self._render_cache.get(key)
        if fn is None:
            def fn(p, x):
                z = self.encoder.apply(p, x)
                return tuple(z) if isinstance(z, list) else z
            fn = jax.jit(fn)
            self._render_cache[key] = fn
        return fn(self.params_E, vox)

    def encode_batch(self, batch: dict):  # fid_evaluation duck-type
        return self.encode(batch)

    def _render_fn(self, img_size: int, num_steps: int):
        key = (img_size, num_steps)
        fn = self._render_cache.get(key)
        if fn is None:
            meta = copy.deepcopy(self.curriculum)
            meta["img_size"] = img_size
            meta["num_steps"] = num_steps
            cfg = RenderConfig.from_metadata(meta, perturb=False)
            if self.shard_rays and jax.device_count() > 1 and (
                img_size % jax.device_count() == 0
            ):
                from ..parallel import make_mesh, render_ray_sharded

                mesh = make_mesh()

                def fn(p, z, c, fov, cfg=cfg, mesh=mesh):
                    return render_ray_sharded(
                        self.generator, p, z, c, cfg, mesh, fov=fov
                    )
            else:
                fn = jax.jit(
                    lambda p, z, c, fov: self.generator.apply(
                        p, z, c, cfg, rng=None, fov=fov
                    )
                )
            self._render_cache[key] = fn
        return fn

    def generate_img(self, z, cam2world, img_size=None, num_steps=None, fov=None):
        img_size = img_size or self.curriculum["img_size"]
        num_steps = num_steps or self.curriculum["num_steps"]
        fov = self.curriculum["fov"] if fov is None else fov
        fn = self._render_fn(img_size, num_steps)
        # fov may be a scalar or a per-image (B,) sweep (batched orbit frames)
        return fn(self.params_G, z, jnp.asarray(cam2world),
                  jnp.asarray(fov, jnp.float32))

    @staticmethod
    def _tile_z(z, n: int):
        """Broadcast a B=1 conditioning (latent / volume / tuple) to batch n.

        The training path batches everything for exactly this reason
        (trainer.py "one batched render"); per-dispatch latency dominates the
        tunnelled-TPU inference loops otherwise (r2 verdict, Weak #1).
        """
        tile = lambda a: jnp.repeat(jnp.asarray(a), n, axis=0)  # noqa: E731
        if isinstance(z, (tuple, list)):
            return tuple(tile(part) for part in z)
        return tile(z)

    def render_batched(self, z, cams, *, fov=None, chunk: int = 8,
                       img_size=None, num_steps=None, z_batched: bool = False):
        """Render many views in few dispatches (numpy rgb/depth stacks).

        The reference loops B=1 per frame/view (inference.py:387-499); on a
        tunnelled TPU per-dispatch latency dominates, so views are rendered
        in blocks of `chunk` (dispatch count = ceil(n/chunk)). `fov` may be a
        per-view (n,) sweep; `z_batched` means z already has batch n (else
        the single conditioning is tiled per block).
        """
        cams = np.asarray(cams)
        n = cams.shape[0]
        rgbs, depths = [], []
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            if z_batched:
                z_c = (tuple(p[s:e] for p in z)
                       if isinstance(z, (tuple, list)) else z[s:e])
            else:
                z_c = self._tile_z(z, e - s)
            fov_c = None
            if fov is not None:
                fov_c = fov if np.ndim(fov) == 0 else jnp.asarray(fov[s:e])
            rgb, d = self.generate_img(z_c, cams[s:e], img_size=img_size,
                                       num_steps=num_steps, fov=fov_c)
            rgbs.append(np.asarray(rgb))
            depths.append(np.asarray(d))
        return np.concatenate(rgbs), np.concatenate(depths)

    def _inference_dir(self) -> Path:
        out = self.run_dir / "inference"
        out.mkdir(parents=True, exist_ok=True)
        return out

    def _cond_batch(self, sample: dict) -> dict:
        return {
            k: np.asarray(v)[None] for k, v in sample.items()
            if k in ("pcl", "voxel")
        }

    # ------------------------------------------------------------------
    # image grids (inference.py:194-340)
    # ------------------------------------------------------------------
    def render_imgs(self, is_fixed: bool) -> Path:
        if is_fixed:
            print("Inference with fixed camera")
            return self._inference_camera(fixed=True)
        print("Inference with uniform spherical camera")
        return self._inference_camera(fixed=False)

    def _inference_camera(self, fixed: bool, cam_noise: float = 0.0) -> Path:
        n = min(self.num_imgs, len(self.valset))
        indices = (
            random.sample(range(len(self.valset)), n) if fixed else list(range(n))
        )
        ray_end = self.curriculum["ray_end"]
        gt_rows, gt_depth_rows, gen_rows, gen_depth_rows = [], [], [], []

        if not fixed:
            origins = sample_camera_positions(
                self.key, n, up_direction=self.up_direction,
                cam_r_start=self.curriculum["cam_r_start"],
                cam_r_end=self.curriculum["cam_r_end"],
            )
            cams = np.asarray(create_cam2world_matrix(origins, self.up_direction))

        # one batched encode + block renders instead of n B=1 dispatches
        # (reference inference.py:227-246 loops max_imgs_per_batch=1)
        samples = [self.valset[i] for i in indices]
        cam_rows = []
        for row, sample in enumerate(samples):
            gt_rows.append(sample["img"] * 0.5 + 0.5)
            depth = sample.get("depth", np.zeros(sample["img"].shape[:2], np.float32))
            gt_depth_rows.append(np.repeat((depth / ray_end)[..., None], 3, -1))
            cam = sample["cam2world"] if fixed else cams[row]
            if fixed and cam_noise > 0:
                cam = perturb_extrinsics(cam[None], cam_noise, self.rng)[0]
            cam_rows.append(np.asarray(cam))
        cond = {
            k: np.stack([np.asarray(s[k]) for s in samples])
            for k in ("pcl", "voxel") if k in samples[0]
        }
        z = self.encode(cond)
        rgb_all, d_all = self.render_batched(
            z, np.stack(cam_rows), z_batched=True
        )
        for rgb, d in zip(rgb_all, d_all):
            gen_rows.append(rgb * 0.5 + 0.5)
            gen_depth_rows.append(np.repeat((d / ray_end)[..., None], 3, -1))

        stamp = datetime.now().strftime("%d--%H:%M:%S.%f")
        mode = "fixed" if fixed else "random"
        out = self._inference_dir() / f"{self.step}_{mode}_{stamp}.png"
        save_image_grid(
            gt_rows + gt_depth_rows + gen_rows + gen_depth_rows, out, nrow=n,
            padding=0,
        )
        print("Save image to", out)
        return out

    # ------------------------------------------------------------------
    # orbit video (inference.py:387-499)
    # ------------------------------------------------------------------
    def render_video(self, car, num_frames: int = 240, fps: int = 24) -> Path:
        import cv2

        assert num_frames > fps * 4 and num_frames % 4 == 0
        if isinstance(car, int):
            sample = self.valset[car]
            car_name = Path(sample["img_path"]).parent.parent.stem
            cond = self._cond_batch(sample)
        else:
            car_name = car
            cond = self._load_car_cond(car)
        print("Rendering video for car", car_name)
        z = self.encode(cond)

        # scripted trajectory (inference.py:442-459)
        theta0 = np.linspace(1e-5, np.pi / 2 - 1e-5, num_frames // 2)
        phi0 = np.linspace(0, np.pi * 2, num_frames // 2)
        theta1 = np.linspace(np.pi / 2 - 1e-5, 1e-5, num_frames // 4)
        phi11 = np.linspace(np.pi * 2, np.pi * 5 / 4, fps)
        phi12 = np.full(num_frames // 4 - fps, np.pi * 5 / 4)
        theta21 = np.linspace(1e-5, np.pi / 4 - 1e-5, fps)
        theta22 = np.full(num_frames // 4 - fps, np.pi / 4 - 1e-5)
        phi2 = np.linspace(np.pi * 5 / 4, 0, num_frames // 4)
        theta = np.concatenate([theta0, theta1, theta21, theta22])
        phi = np.concatenate([phi0, phi11, phi12, phi2])
        r = np.linspace(self.curriculum["cam_r_start"],
                        self.curriculum["cam_r_end"], num_frames)
        fovs = np.linspace(60, 30, num_frames)

        origin = np.zeros((num_frames, 3), np.float32)
        origin[:, 0] = r * np.sin(theta) * np.cos(phi)
        if self.up_direction == "z":
            origin[:, 1] = r * np.sin(theta) * np.sin(phi)
            origin[:, 2] = r * np.cos(theta)
        else:
            origin[:, 2] = r * np.sin(theta) * np.sin(phi)
            origin[:, 1] = r * np.cos(theta)
        cams = np.asarray(
            create_cam2world_matrix(jnp.asarray(origin), self.up_direction)
        )

        img_size = self.curriculum["img_size"]
        stamp = datetime.now().strftime("%d--%H:%M:%S")
        out = (self._inference_dir() / "video" /
               f"{self.run_dir.stem}_{self.step}_{car_name}_{stamp}.mp4")
        out.parent.mkdir(parents=True, exist_ok=True)
        video = cv2.VideoWriter(
            str(out), cv2.VideoWriter_fourcc(*"mp4v"), fps, (img_size, img_size)
        )
        # frame blocks with a per-frame (B,) fov sweep: ≤ num_frames/8
        # dispatches instead of 240 B=1 round trips (r2: 240 dispatches
        # dominated the CLI wall time through the tunnel)
        rgb_all, _ = self.render_batched(
            z, cams, fov=fovs.astype(np.float32), chunk=16
        )
        for frame in rgb_all * 0.5 + 0.5:
            video.write((np.clip(frame, 0, 1)[..., ::-1] * 255).astype(np.uint8))
        video.release()
        print("Writing video to", out)
        return out

    def _load_car_cond(self, car_name: str) -> dict:
        root = Path(self.curriculum["dataset"]["path"]) / car_name
        if self.curriculum["dataset"]["load_pcl"]:
            pcl = np.load(root / "pcl_color.npy").astype(np.float32)
            ratio = self.curriculum.get("num_points_ratio", 1.0)
            n = max(1, int(pcl.shape[0] * ratio))
            return {"pcl": pcl[self.rng.permutation(pcl.shape[0])[:n]][None]}
        name = {64: "voxel.npz", 32: "voxel_32.npz", 128: "voxel_128.npz"}[
            self.curriculum["voxel_resolution"]
        ]
        vox = np.load(root / name)["voxel"].transpose(2, 1, 0, 3).astype(np.float32)
        return {"voxel": vox[None]}

    # ------------------------------------------------------------------
    # colored pcl export (inference.py:501-601)
    # ------------------------------------------------------------------
    def render_pcl(self, pcl_idx: int, num_views: int = 20) -> Path:
        sample = self.valset[pcl_idx]
        car_name = Path(sample["img_path"]).parent.parent.stem
        print("Rendering point clouds for car", car_name)
        z = self.encode(self._cond_batch(sample))

        self.key, sub = jax.random.split(self.key)
        origins = sample_camera_positions(
            sub, num_views, up_direction=self.up_direction,
            cam_r_start=self.curriculum["cam_r_start"],
            cam_r_end=self.curriculum["cam_r_end"],
        )
        cams = np.asarray(create_cam2world_matrix(origins, self.up_direction))

        img_size = self.curriculum["img_size"]
        focal = 1.0 / math.tan(math.radians(self.curriculum["fov"]) / 2.0)
        ray_start, ray_end = self.curriculum["ray_start"], self.curriculum["ray_end"]
        pts_xyz, pts_rgb, rgbs, depth_maps = [], [], [], []
        rgb_all, depth_all = self.render_batched(z, cams)  # block dispatches
        for cam, rgb, depth in zip(cams, rgb_all, depth_all):
            rgbs.append(rgb * 0.5 + 0.5)
            depth_maps.append(np.repeat((depth / ray_end)[..., None], 3, -1))
            valid = (depth > ray_start) & (depth < ray_end)
            ys, xs = np.nonzero(valid)
            d = depth[ys, xs]
            # backproject: pixel NDC → camera plane scaled by depth/focal
            x_cam = (2 * xs - (img_size - 1)) / (img_size - 1) / focal * d
            y_cam = (2 * ys - (img_size - 1)) / (img_size - 1) / focal * d
            pts = np.stack([x_cam, y_cam, d, np.ones_like(d)], axis=1)
            world = pts @ cam.T
            pts_xyz.append(world[:, :3])
            pts_rgb.append(rgb[ys, xs] * 0.5 + 0.5)

        xyz = np.concatenate(pts_xyz)
        rgb255 = np.clip(np.concatenate(pts_rgb) * 255 + 0.5, 0, 255).astype(np.uint8)
        stamp = datetime.now().strftime("%d--%H:%M:%S")
        out = self._inference_dir() / f"{self.step}_{car_name}_{stamp}.obj"
        with open(out, "w") as f:
            for p, c in zip(xyz, rgb255):
                f.write(f"v {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
        print("Saving pcl to", out)
        save_image_grid(
            rgbs + depth_maps,
            self._inference_dir() / f"{self.step}_pcl_{stamp}.png",
            nrow=num_views,
        )
        return out

    def render_pcl_masked(self, pcl_idx: int, num_views: int = 8,
                          mask: bool = True) -> Path:
        """Colored-pcl export from *dataset* views, optionally masking the
        backprojected depth with the GT depth map (inference.py:603-693)."""
        sample0 = self.valset[pcl_idx]
        car_dir = Path(sample0["img_path"]).parent.parent
        car_name = car_dir.stem
        z = self.encode(self._cond_batch(sample0))
        cams_npz = np.load(car_dir / "cameras.npz")
        n_available = len(
            [k for k in cams_npz.files if k.startswith("world_mat_inv_")]
        )
        views = random.sample(range(n_available), min(num_views, n_available))

        img_size = self.curriculum["img_size"]
        focal = 1.0 / math.tan(math.radians(self.curriculum["fov"]) / 2.0)
        ray_start, ray_end = self.curriculum["ray_start"], self.curriculum["ray_end"]
        pts_xyz, pts_rgb = [], []
        view_cams = np.stack([
            cams_npz[f"world_mat_inv_{view}"].astype(np.float32)
            for view in views
        ])
        rgb_all, depth_all = self.render_batched(z, view_cams)
        for view, cam, rgb, depth in zip(views, view_cams, rgb_all, depth_all):
            valid = (depth > ray_start) & (depth < ray_end)
            if mask:
                from ..tools.geometry import backproject_depth  # noqa: F401
                depth_npy = car_dir / "depth" / f"{view:04}.npy"
                exr = car_dir / "depth" / f"{view:04}0001.exr"
                gt = None
                if depth_npy.exists():
                    gt = np.load(depth_npy)
                elif exr.exists():
                    from ..data.exr import read_exr_depth

                    gt = read_exr_depth(exr, img_size)
                if gt is not None:
                    if gt.shape[0] != img_size:
                        import cv2

                        gt = cv2.resize(gt, (img_size, img_size))
                    valid &= gt > 1e-4
            ys, xs = np.nonzero(valid)
            d = depth[ys, xs]
            x_cam = (2 * xs - (img_size - 1)) / (img_size - 1) / focal * d
            y_cam = (2 * ys - (img_size - 1)) / (img_size - 1) / focal * d
            pts = np.stack([x_cam, y_cam, d, np.ones_like(d)], axis=1)
            pts_xyz.append((pts @ cam.T)[:, :3])
            pts_rgb.append(rgb[ys, xs] * 0.5 + 0.5)

        xyz = np.concatenate(pts_xyz)
        rgb255 = np.clip(np.concatenate(pts_rgb) * 255 + 0.5, 0, 255).astype(np.uint8)
        stamp = datetime.now().strftime("%d--%H:%M:%S")
        out = self._inference_dir() / f"{self.step}_{car_name}_masked_{stamp}.obj"
        with open(out, "w") as f:
            for p, c in zip(xyz, rgb255):
                f.write(f"v {p[0]} {p[1]} {p[2]} {c[0]} {c[1]} {c[2]}\n")
        print("Saving masked pcl to", out)
        return out

    # ------------------------------------------------------------------
    # density voxel export (inference.py:342-385)
    # ------------------------------------------------------------------
    def save_voxel(self, car, cube_size: float = 1.2,
                   voxel_resolution: int = 48) -> Path:
        if isinstance(car, int):
            sample = self.valset[car]
            car_name = Path(sample["img_path"]).parent.parent.stem
            cond = self._cond_batch(sample)
        else:
            car_name = car
            cond = self._load_car_cond(car)
        z = self.encode(cond)
        grid = sample_sigma_grid(
            lambda p, pts, zz: self.generator.apply(
                p, pts, zz, method="eval_points"
            ),
            self.params_G, z,
            voxel_resolution=voxel_resolution, cube_length=cube_size,
            max_points=min(64 ** 3, voxel_resolution ** 3),
        )
        out = self._inference_dir() / f"{car_name}.mrc"
        write_mrc(out, grid)
        print("Save voxel to", out)
        return out

    # ------------------------------------------------------------------
    # metrics (inference.py:695-729)
    # ------------------------------------------------------------------
    def compute_metrics(self):
        from ..eval import setup_evaluation, output_images
        from ..eval.metrics import compute_metrics_from_dirs

        meta = self.curriculum
        self.evaluation_path = self.run_dir / (
            f"evaluation_{meta['voxel_resolution']}_{meta['num_steps']}_"
            f"{self.step}_128"
        )
        self.evaluation_path.mkdir(exist_ok=True)
        real_dir = setup_evaluation(meta)
        output_images(self, meta, self.evaluation_path)
        results = compute_metrics_from_dirs(
            real_dir, self.evaluation_path,
            Path(meta["dataset"]["path"]).parent / "val.lst",
        )
        fid, ofid, lpips_score, psnr = results
        from ..eval.weights import stamp_metric_log

        stamp_metric_log(self.run_dir / "fid_inference.txt")
        with open(self.run_dir / "fid_inference.txt", "a") as f:
            f.write(
                f"{self.step} {meta['voxel_resolution']} {meta['num_steps']} "
                f"{fid} {ofid} {lpips_score} {psnr}\n"
            )
        print(
            f"Metrics at step {self.step}: FID {fid} | oFID {ofid} | "
            f"LPIPS {lpips_score} | PSNR {psnr}"
        )
        return results

    # ------------------------------------------------------------------
    # latent interpolation (inference.py:731-834)
    # ------------------------------------------------------------------
    def interpolate_latent_codes(self, src_id: str, tgt_id: str,
                                 save_dir: str | Path, mode: str = "fz",
                                 interpolate_n: int = 8) -> Path:
        cond_src = self._load_car_cond(src_id)
        cond_tgt = self._load_car_cond(tgt_id)
        z_src = self.encode(cond_src)
        z_tgt = self.encode(cond_tgt)

        # camera: view 20 of the source car when available, else view 0
        cams_npz = np.load(
            Path(self.curriculum["dataset"]["path"]) / src_id / "cameras.npz"
        )
        cam_key = "world_mat_inv_20" if "world_mat_inv_20" in cams_npz.files \
            else "world_mat_inv_0"
        cam = cams_npz[cam_key].astype(np.float32)[None]

        # stack all interpolation steps along the batch → one block render
        ts = np.linspace(0.0, 1.0, interpolate_n + 1, dtype=np.float32)

        def lerp(a, b):  # (1, ...) pair → (len(ts), ...) interpolation stack
            return jnp.concatenate([(1 - t) * a + t * b for t in ts], axis=0)

        if isinstance(z_src, tuple):
            fv = lerp(z_src[0], z_tgt[0])
            gz = lerp(z_src[1], z_tgt[1])
            if mode == "f":
                z_it = (fv, jnp.repeat(z_src[1], len(ts), axis=0))
            elif mode == "z":
                z_it = (jnp.repeat(z_src[0], len(ts), axis=0), gz)
            else:
                z_it = (fv, gz)
        else:
            z_it = lerp(z_src, z_tgt)
        cams_rep = np.repeat(cam, len(ts), axis=0)
        rgb_all, _ = self.render_batched(z_it, cams_rep, z_batched=True)
        rows = [rgb * 0.5 + 0.5 for rgb in rgb_all]

        out = Path(save_dir) / f"{src_id}_to_{tgt_id}_{mode}.png"
        out.parent.mkdir(parents=True, exist_ok=True)
        save_image_grid(rows, out, nrow=interpolate_n + 1, padding=0)
        print("saving image to", out)
        return out
