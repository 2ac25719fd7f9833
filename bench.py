#!/usr/bin/env python
"""Benchmark: flagship render throughput (rays/sec/chip).

Measures the eval-protocol render path (SHORTSIREN thesis model: z_dim 512,
hidden 256; 128² images, 48 coarse + 48 fine samples/ray — reference
utils.py:980-983) on the default JAX backend (the real TPU chip under the
driver). Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline: ratio against the PyTorch reference running the same render on
this machine's CPU (measured once and cached in bench_baseline.json; the
reference publishes no GPU numbers — see BASELINE.md). If no baseline is
obtainable, vs_baseline is 1.0 by convention.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
BASELINE_CACHE = REPO / "bench_baseline.json"

IMG_SIZE = 128
NUM_STEPS = 48
BATCH = 2
Z_DIM = 512
HIDDEN = 256

# Per-chip peak matmul throughput (bf16 FLOP/s) by device kind. The render's
# matmuls run at the TPU default precision (bf16 passes), so bf16 peak is the
# right MFU denominator.
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def analytic_flops_per_render() -> float:
    """Matmul FLOPs of one eval-protocol render (the MXU work; sin/integration
    are VPU-bound and conventionally excluded from MFU).

    SHORTSIREN point MLP (models/siren.py spec, hidden 256): per point,
    3→256 (xyz in), 3× 256→256 FiLM trunk, 256→4 head. Hierarchical render
    evaluates B·img²·num_steps coarse + as many fine points. The per-batch
    mapping network (z 512 → 3×256 hidden → 2048 freq/phase) is ~1.6 MFLOP
    per image — 6 orders below the point path — and is ignored.
    """
    per_point = 2 * (3 * HIDDEN + 3 * HIDDEN * HIDDEN + HIDDEN * 4)
    points = BATCH * IMG_SIZE * IMG_SIZE * NUM_STEPS * 2
    return float(per_point) * points


def peak_flops() -> float | None:
    import jax

    kind = jax.devices()[0].device_kind
    # longest-prefix match so "TPU v5 lite" doesn't fall into "TPU v5"
    best = None
    for name, peak in _PEAK_BF16.items():
        if kind.startswith(name) and (best is None or len(name) > len(best[0])):
            best = (name, peak)
    return best[1] if best else None


def measure_tpu() -> float:
    """On-device throughput: renders chained inside one jitted fori_loop.

    Per-dispatch host timing is unreliable on this machine's tunnelled
    runtime (async commits, identical-call memoization), so the renders are
    data-chained on device and forced with a scalar download.
    """
    import jax
    import jax.numpy as jnp

    from conditioned_nerf_gan_tpu.models import ImplicitGenerator3d, RenderConfig

    # the shipped policy: fast-sin + bf16 compute (fp32 params and sin
    # epilogues, bf16 matmul operands and stored activations) + the fused
    # transposed-layout FiLM-SIREN Pallas kernel for the point evals
    gen = ImplicitGenerator3d(siren_type="SHORTSIREN", z_dim=Z_DIM, hidden_dim=HIDDEN,
                              use_fast_sin=True, compute_dtype=jnp.bfloat16,
                              use_pallas=True)
    cfg = RenderConfig(
        img_size=IMG_SIZE, num_steps=NUM_STEPS, fov=49.134342641202636,
        ray_start=0.25, ray_end=1.95, hierarchical_sample=True, white_back=True,
    )
    key = jax.random.PRNGKey(0)
    z = jax.random.normal(key, (BATCH, Z_DIM))
    cams = jnp.broadcast_to(jnp.eye(4), (BATCH, 4, 4)).astype(jnp.float32)
    params = jax.jit(lambda k: gen.init(k, z, cams, cfg))(key)

    iters = 10

    @jax.jit
    def render_loop(k):
        def body(i, acc):
            zz = jax.random.normal(jax.random.fold_in(k, i), (BATCH, Z_DIM))
            px, _ = gen.apply(params, zz, cams, cfg, rng=None)
            return acc + px.mean()
        return jax.lax.fori_loop(0, iters, body, 0.0)

    float(render_loop(key))  # compile + warm
    best = float("inf")
    for trial in range(3):
        t0 = time.perf_counter()
        float(render_loop(jax.random.fold_in(key, 100 + trial)))
        best = min(best, time.perf_counter() - t0)
    return BATCH * IMG_SIZE * IMG_SIZE * iters / best


def measure_train_step(stage: int = 2, steps: int = 4, trials: int = 3) -> float:
    """Full-GAN train-step seconds at a thousand-curriculum stage.

    Same fori-loop protocol as scripts/bench_train_step.py (the TrainState is
    the data dependence; big arrays are jit ARGUMENTS — the remote compile
    helper rejects large closure constants). Captured in the driver artifact
    so regressions in the backward/kernel path are visible, not just the
    eval render (r3 verdict item 3; SURVEY §3.1 hot path).
    """
    import jax
    import jax.numpy as jnp

    from conditioned_nerf_gan_tpu.training import create_train_state, make_train_step
    from conditioned_nerf_gan_tpu.utils.bench_setup import build_stage_bench

    gen, enc, disc, cfg, batch, _meta = build_stage_bench(stage=stage)
    key = jax.random.PRNGKey(0)
    state = jax.jit(lambda k, b: create_train_state(k, gen, enc, disc, b, cfg))(
        key, batch
    )
    jax.block_until_ready(state.params_G)
    train_step = make_train_step(gen, enc, disc, cfg)

    def run_n(state, batch, key):
        def body(i, carry):
            st, acc = carry
            st, metrics = train_step(
                st, batch, jax.random.fold_in(key, i),
                jnp.float32(0.5), jnp.float32(0.0),
            )
            return st, acc + metrics["photo_loss"]
        _, acc = jax.lax.fori_loop(0, steps, body, (state, jnp.zeros(())))
        return acc

    run = jax.jit(run_n)
    float(run(state, batch, key))  # compile + warm
    best = float("inf")
    for t in range(trials):
        t0 = time.perf_counter()
        float(run(state, batch, jax.random.fold_in(key, 100 + t)))
        best = min(best, (time.perf_counter() - t0) / steps)
    return best


def measure_torch_baseline() -> float | None:
    """Reference PyTorch render on CPU (the only hardware both share)."""
    import sys

    if not Path("/root/reference").exists():
        return None
    sys.path.insert(0, "/root/reference")
    try:
        import torch

        from generators import generators as tgen

        model = tgen.ImplicitGenerator3d(
            siren_type="SHORTSIREN", z_dim=Z_DIM, input_dim=3,
            output_dim=4, hidden_dim=HIDDEN,
        )
        model.set_device("cpu")
        model.eval()
        z = torch.randn(1, Z_DIM)
        cam = torch.eye(4).unsqueeze(0)
        kwargs = dict(
            img_size=IMG_SIZE, fov=49.134342641202636, ray_start=0.25,
            ray_end=1.95, num_steps=NUM_STEPS, hierarchical_sample=True,
            clamp_mode="relu", nerf_noise=0.0, white_back=True,
        )
        with torch.no_grad():
            model(z, cam, **kwargs)  # warmup
            t0 = time.perf_counter()
            iters = 2
            for _ in range(iters):
                model(z, cam, **kwargs)
            dt = time.perf_counter() - t0
        return (IMG_SIZE * IMG_SIZE * iters) / dt
    except Exception:
        return None
    finally:
        sys.path.remove("/root/reference")


def _fail_fast_if_tunnel_down() -> None:
    """The default backend on this machine is a remote-TPU relay; when its
    tunnel is down every jit hangs indefinitely. Fail fast with a clear
    message instead (a non-zero exit beats a wedged driver)."""
    import os
    import socket

    if "axon" not in os.environ.get("JAX_PLATFORMS", ""):
        return  # not the relay-backed platform; nothing to probe
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=5).close()
    except OSError:
        raise SystemExit(
            "bench.py: remote TPU tunnel (127.0.0.1:8083) unreachable — "
            "refusing to start (every dispatch would hang)"
        )


def main() -> None:
    _fail_fast_if_tunnel_down()
    # hit the same persistent compile cache as the CLIs/tests — remote
    # compiles of these programs cost ~5 min EACH through the tunnel, and
    # compile time is outside the measurement (the warmup call absorbs it)
    from conditioned_nerf_gan_tpu.utils.cache import setup_compile_cache

    setup_compile_cache()
    value = measure_tpu()
    # serialized AFTER the render measurement — concurrent tunnel jobs
    # distort each other 20-40% (CLAUDE.md perf notes)
    try:
        train_sec = measure_train_step()
    except Exception as exc:  # the render metric must survive a train bench failure
        print(f"bench.py: train-step measurement failed: {exc!r}",
              file=__import__("sys").stderr)
        train_sec = None

    if BASELINE_CACHE.exists():
        baseline = json.loads(BASELINE_CACHE.read_text())
    else:
        ref = measure_torch_baseline()
        baseline = {
            "torch_cpu_rays_per_sec": ref,
            "config": f"{IMG_SIZE}x{IMG_SIZE}, {NUM_STEPS}x2 samples, "
                      f"SHORTSIREN z{Z_DIM} h{HIDDEN}",
        }
        try:
            BASELINE_CACHE.write_text(json.dumps(baseline, indent=2))
        except OSError:
            pass

    ref = baseline.get("torch_cpu_rays_per_sec")
    vs_baseline = round(value / ref, 2) if ref else 1.0

    # MFU: analytic matmul FLOPs per render / wall time, over bf16 peak —
    # an absolute "is it fast" signal next to the relative rays/s ratio.
    rays_per_render = BATCH * IMG_SIZE * IMG_SIZE
    renders_per_sec = value / rays_per_render
    achieved = analytic_flops_per_render() * renders_per_sec
    peak = peak_flops()
    result = {
        "metric": "render_rays_per_sec_128",
        "value": round(value, 1),
        "unit": "rays/s/chip",
        "vs_baseline": vs_baseline,
        "tflops_per_sec": round(achieved / 1e12, 2),
    }
    if peak:
        result["mfu"] = round(achieved / peak, 4)
    if train_sec is not None:
        # second metric in the same line: full-GAN stage-2 step (128²,
        # batch 12, hierarchical, D + R1) — regression tripwire for the
        # backward/kernel path (r3: 0.696 s/step on v5e-1)
        result["train_step_sec_stage2"] = round(train_sec, 4)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
