"""Golden tests: Flax models vs the PyTorch reference with ported weights."""

import hashlib
import re
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference


def stable_seed(name: str) -> int:
    """Deterministic per-name RNG seed (hash() is salted per process)."""
    return int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "little")

from conditioned_nerf_gan_tpu.models import (
    ImplicitGenerator3d,
    RenderConfig,
    ResnetPointnet,
    encode_pcl,
    make_discriminator,
    make_siren,
    make_unet,
)

torch = pytest.importorskip("torch")


def t2j_linear(w):
    return jnp.asarray(w.detach().numpy().T)


def t2j_conv2d(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def t2j_conv3d(w):
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 1, 0))


def t2j(w):
    return jnp.asarray(w.detach().numpy())


def assert_close(j, t, atol=2e-5, rtol=1e-4):
    np.testing.assert_allclose(
        np.asarray(j), t.detach().numpy(), atol=atol, rtol=rtol
    )


def port_film_stack(sd, params, n_layers, prefix=""):
    """Port torch FiLM/Siren `network.{i}.layer` stacks + final layer."""
    p = dict(params)
    for i in range(n_layers):
        for name in (f"FiLMLayer_{i}", f"SirenLayer_{i}"):
            if name in p:
                p[name] = {
                    "TorchLinear_0": {
                        "kernel": t2j_linear(sd[f"{prefix}network.{i}.layer.weight"]),
                        "bias": t2j(sd[f"{prefix}network.{i}.layer.bias"]),
                    }
                }
                break
    p["final_layer"] = {
        "kernel": t2j_linear(sd[f"{prefix}final_layer.weight"]),
        "bias": t2j(sd[f"{prefix}final_layer.bias"]),
    }
    return p


def port_mlp_mapping(sd, prefix, hidden_idxs):
    """Port torch Sequential mapping network to _MLPMapping params."""
    out = {}
    for flax_i, torch_i in enumerate(hidden_idxs):
        out[f"TorchLinear_{flax_i}"] = {
            "kernel": t2j_linear(sd[f"{prefix}.network.{torch_i}.weight"]),
            "bias": t2j(sd[f"{prefix}.network.{torch_i}.bias"]),
        }
    return out


@requires_reference
def test_shortsiren_matches(reference_path):
    from generators import siren as tsiren

    torch.manual_seed(0)
    t_model = tsiren.SHORTSIREN(input_dim=3, z_dim=64, hidden_dim=128, output_dim=4)
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_siren("SHORTSIREN", z_dim=64, hidden_dim=128)
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(2, 50, 3)).astype(np.float32) * 0.4
    z = rng.normal(size=(2, 64)).astype(np.float32)

    variables = jax.jit(lambda k: j_model.init(k, jnp.asarray(pts), jnp.asarray(z)))(
        jax.random.PRNGKey(0)
    )
    params = port_film_stack(sd, variables["params"], 4)
    params["mapping_network"] = port_mlp_mapping(sd, "mapping_network", (0, 2, 4, 6))

    out_j = jax.jit(lambda p: j_model.apply({"params": p}, jnp.asarray(pts), jnp.asarray(z)))(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(pts), torch.from_numpy(z))
    assert_close(out_j, out_t)


@requires_reference
def test_shortsiren_fg_matches(reference_path):
    from generators import siren as tsiren

    torch.manual_seed(1)
    t_model = tsiren.SHORTSIREN_FG(input_dim=16, z_dim=32, hidden_dim=128)
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_siren("SHORTSIREN_FG", z_dim=32, hidden_dim=128)
    rng = np.random.default_rng(1)
    B, R, S, C = 2, 4, 4, 16  # N = R*R*S points, volume channels C
    pts = (rng.random((B, R * R * S, 3)).astype(np.float32) * 1.4) - 0.7
    vol_t = rng.normal(size=(B, C, 8, 8, 8)).astype(np.float32)  # NCDHW
    glob = rng.normal(size=(B, 32)).astype(np.float32)
    vol_j = jnp.asarray(vol_t.transpose(0, 2, 3, 4, 1))  # NDHWC

    variables = jax.jit(
        lambda k: j_model.init(k, jnp.asarray(pts), (vol_j, jnp.asarray(glob)))
    )(jax.random.PRNGKey(0))
    params = port_film_stack(sd, variables["params"], 4)
    params["mapping_network"] = {
        "TorchLinear_0": {
            "kernel": t2j_linear(sd["mapping_network.weight"]),
            "bias": t2j(sd["mapping_network.bias"]),
        }
    }

    out_j = jax.jit(
        lambda p: j_model.apply(
            {"params": p}, jnp.asarray(pts), (vol_j, jnp.asarray(glob))
        )
    )(params)
    with torch.no_grad():
        out_t = t_model(
            torch.from_numpy(pts),
            (torch.from_numpy(vol_t), torch.from_numpy(glob)),
            R,  # img_size
            S,  # num_steps
        )
    assert_close(out_j, out_t)


@requires_reference
def test_tallsiren_matches(reference_path):
    """Per-point mapping on sampled features (TALLSIREN, siren.py:232-331)."""
    from generators import siren as tsiren

    torch.manual_seed(2)
    t_model = tsiren.TALLSIREN(input_dim=3, z_dim=16, hidden_dim=64)
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_siren("TALLSIREN", z_dim=16, hidden_dim=64)
    rng = np.random.default_rng(2)
    B, R, S, C = 1, 4, 3, 16
    pts = (rng.random((B, R * R * S, 3)).astype(np.float32) * 1.4) - 0.7
    vol_t = rng.normal(size=(B, C, 6, 6, 6)).astype(np.float32)
    vol_j = jnp.asarray(vol_t.transpose(0, 2, 3, 4, 1))

    variables = jax.jit(lambda k: j_model.init(k, jnp.asarray(pts), vol_j))(
        jax.random.PRNGKey(0)
    )
    params = port_film_stack(sd, variables["params"], 8)
    params["mapping_network"] = port_mlp_mapping(sd, "mapping_network", (0, 2))

    out_j = jax.jit(lambda p: j_model.apply({"params": p}, jnp.asarray(pts), vol_j))(
        params
    )
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(pts), torch.from_numpy(vol_t), R, S)
    assert_close(out_j, out_t)


@requires_reference
def test_resnet_pointnet_matches(reference_path):
    from generators import pointnet as tpn

    torch.manual_seed(3)
    t_model = tpn.ResnetPointnet(c_dim=64, dim=6, hidden_dim=64)
    t_model.eval()
    sd = t_model.state_dict()

    j_model = ResnetPointnet(c_dim=64, hidden_dim=64)
    rng = np.random.default_rng(3)
    pcl = rng.normal(size=(2, 100, 6)).astype(np.float32)

    variables = jax.jit(lambda k: j_model.init(k, jnp.asarray(pcl)))(
        jax.random.PRNGKey(0)
    )
    params = {}
    params["fc_pos"] = {
        "kernel": t2j_linear(sd["fc_pos.weight"]), "bias": t2j(sd["fc_pos.bias"])
    }
    for i in range(5):
        blk = {
            "fc_0": {"kernel": t2j_linear(sd[f"block_{i}.fc_0.weight"]),
                      "bias": t2j(sd[f"block_{i}.fc_0.bias"])},
            "fc_1": {"kernel": t2j_linear(sd[f"block_{i}.fc_1.weight"]),
                      "bias": t2j(sd[f"block_{i}.fc_1.bias"])},
        }
        if f"block_{i}.shortcut.weight" in sd:
            blk["shortcut"] = {"kernel": t2j_linear(sd[f"block_{i}.shortcut.weight"])}
        params[f"block_{i}"] = blk
    params["fc_c"] = {
        "kernel": t2j_linear(sd["fc_c.weight"]), "bias": t2j(sd["fc_c.bias"])
    }

    out_j = jax.jit(lambda p: j_model.apply({"params": p}, jnp.asarray(pcl)))(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(pcl))
    assert_close(out_j, out_t, atol=5e-5)

    # encode_pcl normalization parity (pointnet.py:164-180), noise_weight=0
    z_j, reg_j = jax.jit(
        lambda p, x: encode_pcl(lambda pp, xx: j_model.apply(pp, xx), p, x)
    )({"params": params}, jnp.asarray(pcl))
    with torch.no_grad():
        z_t, reg_t = tpn.encode_pcl(t_model, torch.from_numpy(pcl), "cpu", 0)
    assert_close(z_j, z_t, atol=1e-4)
    assert_close(reg_j, reg_t, atol=1e-4)


def port_progressive_discriminator(sd, n_layers=8, n_adapters=9,
                                   final_layer=True):
    params = {}
    for i in range(n_adapters):
        params[f"fromRGB_{i}"] = {"conv": {
            "kernel": t2j_conv2d(sd[f"fromRGB.{i}.model.0.weight"]),
            "bias": t2j(sd[f"fromRGB.{i}.model.0.bias"]),
        }}
    for i in range(n_layers):
        layer = {
            "conv1": {"kernel": t2j_conv2d(sd[f"layers.{i}.network.0.conv.weight"]),
                       "bias": t2j(sd[f"layers.{i}.network.0.conv.bias"])},
            "conv2": {"kernel": t2j_conv2d(sd[f"layers.{i}.network.2.conv.weight"]),
                       "bias": t2j(sd[f"layers.{i}.network.2.conv.bias"])},
        }
        if f"layers.{i}.proj.weight" in sd:
            layer["proj"] = {"kernel": t2j_conv2d(sd[f"layers.{i}.proj.weight"]),
                              "bias": t2j(sd[f"layers.{i}.proj.bias"])}
        params[f"layer_{i}"] = layer
    if final_layer:
        params["final_layer"] = {
            "kernel": t2j_conv2d(sd["final_layer.weight"]),
            "bias": t2j(sd["final_layer.bias"]),
        }
    return params


@requires_reference
@pytest.mark.parametrize("img_size,alpha", [(32, 0.3), (64, 1.0)])
def test_progressive_discriminator_matches(reference_path, img_size, alpha):
    import importlib
    import sys
    # the reference module imports tkinter junk; stub it if missing
    for mod in ("tkinter", "tkinter.tix"):
        sys.modules.setdefault(mod, mock.MagicMock())
    tdisc = importlib.import_module("discriminators.discriminators")

    torch.manual_seed(4)
    t_model = tdisc.ProgressiveDiscriminator()
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_discriminator("ProgressiveDiscriminator")
    rng = np.random.default_rng(4)
    img = rng.normal(size=(2, 3, img_size, img_size)).astype(np.float32)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))

    variables = jax.jit(lambda k: j_model.init(k, img_j, alpha))(jax.random.PRNGKey(0))
    params = port_progressive_discriminator(sd)

    out_j = jax.jit(lambda p: j_model.apply({"params": p}, img_j, alpha))(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(img), alpha)
    assert_close(out_j, out_t, atol=2e-4)


def port_single_conv(sd, key):
    out = {}
    if f"{key}.conv.weight" in sd:
        out["conv"] = {"kernel": t2j_conv3d(sd[f"{key}.conv.weight"])}
        if f"{key}.conv.bias" in sd:
            out["conv"]["bias"] = t2j(sd[f"{key}.conv.bias"])
    if f"{key}.groupnorm.weight" in sd:
        out["groupnorm"] = {"scale": t2j(sd[f"{key}.groupnorm.weight"]),
                             "bias": t2j(sd[f"{key}.groupnorm.bias"])}
    return out


@requires_reference
def test_unet3d_matches(reference_path):
    from generators import unet3d as tunet

    torch.manual_seed(5)
    t_model = tunet.UNet3D(
        in_channels=4, out_channels=8, f_maps=8, num_levels=3,
        is_segmentation=False, final_sigmoid=False, return_global=True,
    )
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_unet(
        "UNet3D", in_channels=4, out_channels=8, f_maps=8, num_levels=3,
        is_segmentation=False, final_sigmoid=False, return_global=True,
    )
    rng = np.random.default_rng(5)
    vox = rng.normal(size=(1, 4, 16, 16, 16)).astype(np.float32)
    vox_j = jnp.asarray(vox.transpose(0, 2, 3, 4, 1))

    variables = jax.jit(lambda k: j_model.init(k, vox_j))(jax.random.PRNGKey(0))
    params = {}
    for i in range(3):
        params[f"encoder_{i}"] = {
            "SingleConv1": port_single_conv(sd, f"encoders.{i}.basic_module.SingleConv1"),
            "SingleConv2": port_single_conv(sd, f"encoders.{i}.basic_module.SingleConv2"),
        }
    for i in range(2):
        params[f"decoder_{i}"] = {
            "SingleConv1": port_single_conv(sd, f"decoders.{i}.basic_module.SingleConv1"),
            "SingleConv2": port_single_conv(sd, f"decoders.{i}.basic_module.SingleConv2"),
        }
    params["final_conv"] = {
        "kernel": t2j_conv3d(sd["final_conv.weight"]),
        "bias": t2j(sd["final_conv.bias"]),
    }

    out_j, glob_j = jax.jit(lambda p: j_model.apply({"params": p}, vox_j))(params)
    with torch.no_grad():
        out_t, glob_t = t_model(torch.from_numpy(vox))
    assert_close(glob_j, glob_t, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 4, 1, 2, 3), out_t.numpy(), atol=1e-4, rtol=1e-3
    )


@requires_reference
def test_generator_end_to_end_matches(reference_path):
    """Full render parity: ImplicitGenerator3d vs reference, deterministic RNG.

    torch.rand is mocked to 0.5 (zero stratified offset) for perturbation and
    to linspace (== det inverse-CDF) for sample_pdf; torch.randn → 0 (no
    density noise). The JAX side renders with rng=None, which is exactly that
    deterministic path.
    """
    from generators import generators as tgen
    from generators import volumetric_rendering as vr

    torch.manual_seed(6)
    t_model = tgen.ImplicitGenerator3d(
        siren_type="SHORTSIREN", z_dim=64, input_dim=3, output_dim=4, hidden_dim=64
    )
    t_model.set_device("cpu")
    t_model.eval()
    sd = t_model.siren.state_dict()

    img_size, num_steps = 8, 6
    j_model = ImplicitGenerator3d(siren_type="SHORTSIREN", z_dim=64, hidden_dim=64)
    cfg = RenderConfig(
        img_size=img_size, num_steps=num_steps, fov=30.0, ray_start=0.7,
        ray_end=1.3, hierarchical_sample=True, clamp_mode="relu",
        white_back=True, perturb=False,
    )

    rng = np.random.default_rng(6)
    z = rng.normal(size=(2, 64)).astype(np.float32)
    origins = rng.normal(size=(2, 3)).astype(np.float32)
    origins /= np.linalg.norm(origins, axis=1, keepdims=True)
    cam_t = vr.create_cam2world_matrix(torch.from_numpy(origins), "y", device="cpu")
    cam_j = jnp.asarray(cam_t.numpy())

    variables = jax.jit(lambda k: j_model.init(k, jnp.asarray(z), cam_j, cfg))(
        jax.random.PRNGKey(0)
    )
    siren_params = port_film_stack(sd, variables["params"]["siren"], 4)
    siren_params["mapping_network"] = port_mlp_mapping(sd, "mapping_network", (0, 2, 4, 6))
    params = {"params": {"siren": siren_params}}

    def fake_rand(*args, **kwargs):
        shape = args[0] if isinstance(args[0], (tuple, torch.Size)) else tuple(args)
        if len(shape) == 4:  # perturb offsets → 0.5 (no offset)
            return torch.full(shape, 0.5)
        if len(shape) == 2:  # sample_pdf u → linspace == det mode
            n_rays, n_imp = shape
            return torch.linspace(0, 1, n_imp).expand(n_rays, n_imp).contiguous()
        raise AssertionError(f"unexpected rand shape {shape}")

    with torch.no_grad(), \
         mock.patch.object(vr.torch, "rand", fake_rand), \
         mock.patch.object(vr.torch, "randn", lambda *a, **k: torch.zeros(a[0] if isinstance(a[0], (tuple, torch.Size)) else a)):
        px_t, depth_t = t_model(
            torch.from_numpy(z), cam_t, img_size=img_size, fov=30.0,
            ray_start=0.7, ray_end=1.3, num_steps=num_steps,
            hierarchical_sample=True, clamp_mode="relu", nerf_noise=0.5,
            white_back=True,
        )

    px_j, depth_j = jax.jit(
        lambda p: j_model.apply(p, jnp.asarray(z), cam_j, cfg, rng=None)
    )(params)

    np.testing.assert_allclose(
        np.asarray(px_j).transpose(0, 3, 1, 2), px_t.numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(depth_j), depth_t.numpy(), atol=5e-4, rtol=1e-3)


def _variant_inputs(siren_type, B=1, N=16, C=8):
    """Random (points, z) matching a registry variant's conditioning shape."""
    from conditioned_nerf_gan_tpu.models.siren import SIREN_SPECS

    rng = np.random.default_rng(stable_seed(siren_type))
    pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.3)
    vol = jnp.asarray(rng.normal(size=(B, 4, 4, 4, C)).astype(np.float32))
    glob = jnp.asarray(rng.normal(size=(B, C)).astype(np.float32))
    if siren_type not in SIREN_SPECS:  # legacy classes: unconditional z
        return pts, glob
    spec = SIREN_SPECS[siren_type]
    if spec.input == "pyramid":
        return pts, ([vol, vol], glob)
    if spec.mapping_source == "z":
        return pts, glob
    if spec.mapping_source == "global" or spec.input in ("features",
                                                         "features_points"):
        return pts, (vol, glob) if spec.mapping is not None else vol
    return pts, vol


@pytest.mark.parametrize("siren_type", __import__(
    "conditioned_nerf_gan_tpu.models.siren", fromlist=["SIREN_REGISTRY"]
).SIREN_REGISTRY)
def test_siren_variants_execute(siren_type):
    """EVERY registry name initializes AND executes the math: the forward
    runs under jit on random inputs and produces finite (B, N, 4) values
    (the r3 eval_shape-only smoke let a NaN-producing wiring bug pass)."""
    B, N, C = 1, 16, 8
    pts, z = _variant_inputs(siren_type, B, N, C)
    # EmbeddingPiGAN runs with its full-size cube (96³/64³) on purpose —
    # the ctor wiring (res, init scale) is part of the registry contract
    model = make_siren(siren_type, z_dim=C, hidden_dim=32)
    variables = jax.jit(lambda k: model.init(k, pts, z))(jax.random.PRNGKey(0))
    out = jax.jit(lambda p: model.apply(p, pts, z))(variables)
    assert out.shape == (B, N, 4)
    assert bool(jnp.all(jnp.isfinite(out))), f"{siren_type} produced non-finite output"


def test_pointfeat_variant_composes_with_pyramid_encoder():
    """pointfeat-mapping variants (TALLSIREN: FiLM source = sampled features)
    must accept a PyramidUNet3D feature LIST like the input-path branches do
    (r4 review: sample_volume_features crashed on a pyramid at trace time)."""
    from conditioned_nerf_gan_tpu.models import make_siren

    B, N, C = 1, 16, 8
    rng = np.random.default_rng(stable_seed("TALLSIREN_pyramid"))
    pts = jnp.asarray(rng.normal(size=(B, N, 3)).astype(np.float32) * 0.3)
    lvl0 = jnp.asarray(rng.normal(size=(B, 4, 4, 4, C)).astype(np.float32))
    lvl1 = jnp.asarray(rng.normal(size=(B, 2, 2, 2, C)).astype(np.float32))
    model = make_siren("TALLSIREN", z_dim=C, hidden_dim=32)
    variables = jax.jit(lambda k: model.init(k, pts, [lvl0, lvl1]))(
        jax.random.PRNGKey(0))
    out = jax.jit(lambda p, z: model.apply(p, pts, z))(variables, [lvl0, lvl1])
    assert out.shape == (B, N, 4)
    assert bool(jnp.all(jnp.isfinite(out)))
    # degrades to the plain single-volume lookup for a non-list input
    single = jax.jit(lambda k: model.init(k, pts, lvl0))(jax.random.PRNGKey(0))
    out1 = jax.jit(lambda p, z: model.apply(p, pts, z))(single, lvl0)
    assert bool(jnp.all(jnp.isfinite(out1)))


def test_film_frequency_folding_matches_reference_formulation():
    """Under the bf16 policy the FiLM layer folds freq into the weights
    (layers.py fold path); it must match the reference formulation
    sin(freq*(xW+b)+phase) to bf16 tolerance with identical params."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from conditioned_nerf_gan_tpu.models.layers import FiLMLayer

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(3, 50, 16)).astype(np.float32))
    freq = jnp.asarray(rng.uniform(25, 45, (3, 24)).astype(np.float32))
    phase = jnp.asarray(rng.normal(size=(3, 24)).astype(np.float32))

    l_ref = FiLMLayer(24)
    l_fold = FiLMLayer(24, dtype=jnp.bfloat16)
    params = l_ref.init(jax.random.PRNGKey(0), x, freq, phase)
    # same param tree for both paths
    assert jax.tree.structure(params) == jax.tree.structure(
        l_fold.init(jax.random.PRNGKey(0), x, freq, phase)
    )
    y_ref = l_ref.apply(params, x, freq, phase)
    y_fold = l_fold.apply(params, x, freq, phase).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref),
                               atol=0.05)

    # freq gradient through the fold matches the reference formulation
    gf = jax.grad(lambda f: jnp.mean(
        l_fold.apply(params, x, f, phase).astype(jnp.float32) ** 2))(freq)
    gr = jax.grad(lambda f: jnp.mean(l_ref.apply(params, x, f, phase) ** 2))(freq)
    rel = float(jnp.max(jnp.abs(gf - gr)) / (jnp.max(jnp.abs(gr)) + 1e-9))
    assert rel < 0.1, rel


def test_pointnet_pooled_split_matches_concat():
    """ResnetPointnet computes the pooled context as a once-per-batch matmul
    (TorchLinear extra operand); must equal the reference concat formulation
    exactly (relu and matmul distribute over the concat split)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn
    from conditioned_nerf_gan_tpu.models.layers import TorchLinear
    from conditioned_nerf_gan_tpu.models.pointnet import ResnetPointnet

    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.uniform(-0.4, 0.4, (2, 100, 6)).astype(np.float32))
    net = ResnetPointnet(c_dim=32, hidden_dim=16)
    params = net.init(jax.random.PRNGKey(0), p)

    class RefBlock(nn.Module):
        size_out: int

        @nn.compact
        def __call__(self, x):
            size_h = min(x.shape[-1], self.size_out)
            h = TorchLinear(size_h, name="fc_0")(nn.relu(x))
            dx = TorchLinear(self.size_out, kernel_init=nn.initializers.zeros,
                             name="fc_1")(nn.relu(h))
            x_s = x if x.shape[-1] == self.size_out else TorchLinear(
                self.size_out, use_bias=False, name="shortcut")(x)
            return x_s + dx

    class RefPointnet(nn.Module):
        @nn.compact
        def __call__(self, p):
            h = 16
            x = TorchLinear(2 * h, name="fc_pos")(p)
            x = RefBlock(h, name="block_0")(x)
            for i in range(1, 5):
                pooled = jnp.broadcast_to(
                    jnp.max(x, axis=1, keepdims=True), x.shape)
                x = RefBlock(h, name=f"block_{i}")(
                    jnp.concatenate([x, pooled], axis=2))
            x = jnp.max(x, axis=1)
            return TorchLinear(32, name="fc_c")(nn.relu(x))

    y_new = net.apply(params, p)
    y_ref = RefPointnet().apply(params, p)
    np.testing.assert_allclose(np.asarray(y_new), np.asarray(y_ref), atol=1e-5)


@pytest.mark.parametrize("name", sorted(__import__(
    "conditioned_nerf_gan_tpu.models.discriminators",
    fromlist=["DISCRIMINATOR_REGISTRY"]
).DISCRIMINATOR_REGISTRY))
def test_discriminator_registry_executes(name):
    """Every discriminator registry name initializes and executes under jit
    with finite logits (torch-parity is covered by the golden tests; this
    guards the registry wiring even when the reference isn't mounted)."""
    model = make_discriminator(name)
    rng = np.random.default_rng(stable_seed(name))
    img = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    cond = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
    kwargs = {"cond": cond} if ("inputCat" in name or "projection" in name) else {}
    variables = jax.jit(
        lambda k: model.init(k, img, 0.6, **kwargs)
    )(jax.random.PRNGKey(1))
    out = jax.jit(lambda p: model.apply(p, img, 0.6, **kwargs))(variables)
    logits = out[0] if isinstance(out, tuple) else out
    assert logits.shape[0] == 2
    assert bool(jnp.all(jnp.isfinite(logits))), name
