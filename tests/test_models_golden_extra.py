"""Golden tests for the remaining model variants (discriminators, U-Nets,
legacy sirens) vs the PyTorch reference with ported weights."""

import sys
from unittest import mock

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from conftest import requires_reference

from conditioned_nerf_gan_tpu.models import make_discriminator, make_siren, make_unet
from test_models_golden import (
    assert_close,
    port_film_stack,
    port_mlp_mapping,
    port_progressive_discriminator,
    port_single_conv,
    t2j,
    t2j_conv2d,
    t2j_conv3d,
    t2j_linear,
)

torch = pytest.importorskip("torch")


def _tdisc(reference_path):
    import importlib

    for mod in ("tkinter", "tkinter.tix"):
        sys.modules.setdefault(mod, mock.MagicMock())
    return importlib.import_module("discriminators.discriminators")


def _tsg(reference_path):
    import importlib

    for mod in ("tkinter", "tkinter.tix"):
        sys.modules.setdefault(mod, mock.MagicMock())
    return importlib.import_module("discriminators.sgdiscriminators")


@requires_reference
def test_progressive_encoder_discriminator_matches(reference_path):
    tdisc = _tdisc(reference_path)
    torch.manual_seed(10)
    t_model = tdisc.ProgressiveEncoderDiscriminator()
    t_model.eval()
    params = port_progressive_discriminator(t_model.state_dict())

    j_model = make_discriminator("ProgressiveEncoderDiscriminator")
    rng = np.random.default_rng(10)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    jax.jit(lambda k: j_model.init(k, img_j, 0.7))(jax.random.PRNGKey(0))

    pred_j, latent_j, pos_j = jax.jit(
        lambda p: j_model.apply({"params": p}, img_j, 0.7)
    )(params)
    with torch.no_grad():
        pred_t, latent_t, pos_t = t_model(torch.from_numpy(img), 0.7)
    assert_close(pred_j, pred_t, atol=2e-4)
    assert_close(latent_j, latent_t, atol=2e-4)
    assert_close(pos_j, pos_t, atol=2e-4)


@requires_reference
def test_input_cat_discriminator_matches(reference_path):
    tdisc = _tdisc(reference_path)
    torch.manual_seed(11)
    t_model = tdisc.ProgressiveDiscriminator_inputCat()
    t_model.eval()
    params = port_progressive_discriminator(t_model.state_dict())

    j_model = make_discriminator("ProgressiveDiscriminator_inputCat")
    rng = np.random.default_rng(11)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    cond = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    cond_j = jnp.asarray(cond.transpose(0, 2, 3, 1))
    jax.jit(lambda k: j_model.init(k, img_j, 0.5, cond=cond_j))(jax.random.PRNGKey(0))

    out_j = jax.jit(
        lambda p: j_model.apply({"params": p}, img_j, 0.5, cond=cond_j)
    )(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(img), 0.5, cond=torch.from_numpy(cond))
    assert_close(out_j, out_t, atol=2e-4)


def _port_strided(sd, n_layers=7, n_adapters=8):
    params = {}
    for i in range(n_adapters):
        params[f"fromRGB_{i}"] = {"conv": {
            "kernel": t2j_conv2d(sd[f"fromRGB.{i}.model.0.weight"]),
            "bias": t2j(sd[f"fromRGB.{i}.model.0.bias"]),
        }}
    for i in range(n_layers):
        params[f"layer_{i}"] = {
            "conv1": {"kernel": t2j_conv2d(sd[f"layers.{i}.network.0.conv.weight"])
                      if f"layers.{i}.network.0.conv.weight" in sd
                      else t2j_conv2d(sd[f"layers.{i}.network.0.weight"]),
                      "bias": t2j(sd.get(f"layers.{i}.network.0.conv.bias",
                                          sd.get(f"layers.{i}.network.0.bias")))},
            "conv2": {"kernel": t2j_conv2d(sd[f"layers.{i}.network.2.conv.weight"])
                      if f"layers.{i}.network.2.conv.weight" in sd
                      else t2j_conv2d(sd[f"layers.{i}.network.2.weight"]),
                      "bias": t2j(sd.get(f"layers.{i}.network.2.conv.bias",
                                          sd.get(f"layers.{i}.network.2.bias")))},
            "proj": {"kernel": t2j_conv2d(sd[f"layers.{i}.proj.weight"]),
                     "bias": t2j(sd[f"layers.{i}.proj.bias"])},
        }
    params["final_layer"] = {
        "kernel": t2j_conv2d(sd["final_layer.weight"]),
        "bias": t2j(sd["final_layer.bias"]),
    }
    return params


@requires_reference
@pytest.mark.parametrize("name", ["StridedDiscriminator", "CCSDiscriminator",
                                  "CCSEncoderDiscriminator"])
def test_legacy_strided_discriminators_match(reference_path, name):
    tsg = _tsg(reference_path)
    torch.manual_seed(12)
    t_model = getattr(tsg, name)()
    t_model.eval()
    params = _port_strided(t_model.state_dict())

    j_model = make_discriminator(name)
    rng = np.random.default_rng(12)
    img = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    img_j = jnp.asarray(img.transpose(0, 2, 3, 1))
    jax.jit(lambda k: j_model.init(k, img_j, 1.0))(jax.random.PRNGKey(0))

    out_j = jax.jit(lambda p: j_model.apply({"params": p}, img_j, 1.0))(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(img), 1.0)
    assert_close(out_j[0], out_t[0], atol=3e-4)
    if out_t[1] is not None:
        assert_close(out_j[1], out_t[1], atol=3e-4)
        assert_close(out_j[2], out_t[2], atol=3e-4)


@requires_reference
def test_residual_unet3d_matches(reference_path):
    from generators import unet3d as tunet

    torch.manual_seed(13)
    t_model = tunet.ResidualUNet3D(
        in_channels=4, out_channels=8, f_maps=8, num_levels=3,
        is_segmentation=False, final_sigmoid=False, return_global=False,
    )
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_unet(
        "ResidualUNet3D", in_channels=4, out_channels=8, f_maps=8,
        num_levels=3, is_segmentation=False, final_sigmoid=False,
        return_global=False,
    )
    rng = np.random.default_rng(13)
    vox = rng.normal(size=(1, 4, 16, 16, 16)).astype(np.float32)
    vox_j = jnp.asarray(vox.transpose(0, 2, 3, 4, 1))
    jax.jit(lambda k: j_model.init(k, vox_j))(jax.random.PRNGKey(0))

    params = {}
    for i in range(3):
        params[f"encoder_{i}"] = {
            name: port_single_conv(sd, f"encoders.{i}.basic_module.{name}")
            for name in ("conv1", "conv2", "conv3")
        }
    for i in range(2):
        params[f"decoder_{i}"] = {
            name: port_single_conv(sd, f"decoders.{i}.basic_module.{name}")
            for name in ("conv1", "conv2", "conv3")
        }
        # transposed conv: torch weight (C_in, C_out, k, k, k) → flax expects
        # our (k,k,k,C_in,C_out) with the spatial flip applied at runtime, so
        # port with transpose only (ConvTranspose3d flips internally).
        w = sd[f"decoders.{i}.upsampling.upsample.weight"]
        params[f"upconv_{i}"] = {
            "kernel": jnp.asarray(w.detach().numpy().transpose(2, 3, 4, 0, 1)),
            "bias": t2j(sd[f"decoders.{i}.upsampling.upsample.bias"]),
        }
    params["final_conv"] = {
        "kernel": t2j_conv3d(sd["final_conv.weight"]),
        "bias": t2j(sd["final_conv.bias"]),
    }

    out_j = jax.jit(lambda p: j_model.apply({"params": p}, vox_j))(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(vox))
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 4, 1, 2, 3), out_t.numpy(),
        atol=2e-4, rtol=1e-3,
    )


@requires_reference
def test_pyramid_unet3d_matches(reference_path):
    from generators import unet3d as tunet

    torch.manual_seed(14)
    t_model = tunet.PyramidUNet3D(
        in_channels=4, out_channels=8, f_maps=8, num_levels=3,
        is_segmentation=False, final_sigmoid=False, return_global=True,
    )
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_unet(
        "PyramidUNet3D", in_channels=4, out_channels=8, f_maps=8,
        num_levels=3, is_segmentation=False, final_sigmoid=False,
        return_global=True,
    )
    rng = np.random.default_rng(14)
    vox = rng.normal(size=(1, 4, 16, 16, 16)).astype(np.float32)
    vox_j = jnp.asarray(vox.transpose(0, 2, 3, 4, 1))
    jax.jit(lambda k: j_model.init(k, vox_j))(jax.random.PRNGKey(0))

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

    pyramid_j, glob_j = jax.jit(lambda p: j_model.apply({"params": p}, vox_j))(params)
    with torch.no_grad():
        pyramid_t, glob_t = t_model(torch.from_numpy(vox))
    assert len(pyramid_j) == len(pyramid_t)
    assert_close(glob_j, glob_t, atol=1e-4)
    for lvl_j, lvl_t in zip(pyramid_j, pyramid_t):
        np.testing.assert_allclose(
            np.asarray(lvl_j).transpose(0, 4, 1, 2, 3), lvl_t.numpy(),
            atol=2e-4, rtol=1e-3,
        )


@requires_reference
def test_tallsiren_dres_matches(reference_path):
    from generators import siren as tsiren

    torch.manual_seed(15)
    t_model = tsiren.TALLSIREN_dRes(z_dim=16, hidden_dim=32)
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_siren("TALLSIREN_dRes", z_dim=16, hidden_dim=32)
    rng = np.random.default_rng(15)
    B, R, S, C = 1, 4, 3, 16
    pts = (rng.random((B, R * R * S, 3)).astype(np.float32) * 1.2) - 0.6
    vol_t = rng.normal(size=(B, C, 6, 6, 6)).astype(np.float32)
    vol_j = jnp.asarray(vol_t.transpose(0, 2, 3, 4, 1))
    jax.jit(lambda k: j_model.init(k, jnp.asarray(pts), vol_j))(jax.random.PRNGKey(0))

    params = {
        "SirenLayer_0": {"TorchLinear_0": {
            "kernel": t2j_linear(sd["network.0.layer.weight"]),
            "bias": t2j(sd["network.0.layer.bias"])}},
        "ResSirenBlock_0": {
            "TorchLinear_0": {"kernel": t2j_linear(sd["network.1.fc1.weight"]),
                               "bias": t2j(sd["network.1.fc1.bias"])},
            "TorchLinear_1": {"kernel": t2j_linear(sd["network.1.fc2.weight"]),
                               "bias": t2j(sd["network.1.fc2.bias"])}},
        "ResSirenBlock_1": {
            "TorchLinear_0": {"kernel": t2j_linear(sd["network.2.fc1.weight"]),
                               "bias": t2j(sd["network.2.fc1.bias"])},
            "TorchLinear_1": {"kernel": t2j_linear(sd["network.2.fc2.weight"]),
                               "bias": t2j(sd["network.2.fc2.bias"])}},
        "SirenLayer_1": {"TorchLinear_0": {
            "kernel": t2j_linear(sd["network.3.layer.weight"]),
            "bias": t2j(sd["network.3.layer.bias"])}},
        "final_layer": {"kernel": t2j_linear(sd["final_layer.weight"]),
                         "bias": t2j(sd["final_layer.bias"])},
    }
    out_j = jax.jit(lambda p: j_model.apply({"params": p}, jnp.asarray(pts), vol_j))(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(pts), torch.from_numpy(vol_t), R, S)
    assert_close(out_j, out_t, atol=5e-5)


@requires_reference
def test_spatial_siren_baseline_matches(reference_path):
    from generators import siren as tsiren

    torch.manual_seed(16)
    t_model = tsiren.SPATIALSIRENBASELINE(z_dim=32, hidden_dim=32)
    t_model.eval()
    sd = t_model.state_dict()

    j_model = make_siren("SPATIALSIRENBASELINE", z_dim=32, hidden_dim=32)
    rng = np.random.default_rng(16)
    pts = rng.normal(size=(2, 20, 3)).astype(np.float32) * 0.1
    z = rng.normal(size=(2, 32)).astype(np.float32)
    dirs = rng.normal(size=(2, 20, 3)).astype(np.float32)
    jax.jit(
        lambda k: j_model.init(k, jnp.asarray(pts), jnp.asarray(z),
                               jnp.asarray(dirs))
    )(jax.random.PRNGKey(0))

    params = {}
    for i in range(8):
        params[f"FiLMLayer_{i}"] = {"TorchLinear_0": {
            "kernel": t2j_linear(sd[f"network.{i}.layer.weight"]),
            "bias": t2j(sd[f"network.{i}.layer.bias"])}}
    params["final_layer"] = {"kernel": t2j_linear(sd["final_layer.weight"]),
                              "bias": t2j(sd["final_layer.bias"])}
    params["color_layer_sine"] = {"TorchLinear_0": {
        "kernel": t2j_linear(sd["color_layer_sine.layer.weight"]),
        "bias": t2j(sd["color_layer_sine.layer.bias"])}}
    params["color_layer_linear"] = {
        "kernel": t2j_linear(sd["color_layer_linear.0.weight"]),
        "bias": t2j(sd["color_layer_linear.0.bias"])}
    params["mapping_network"] = port_mlp_mapping(sd, "mapping_network",
                                                 (0, 2, 4, 6))

    out_j = jax.jit(
        lambda p: j_model.apply({"params": p}, jnp.asarray(pts),
                                jnp.asarray(z), jnp.asarray(dirs))
    )(params)
    with torch.no_grad():
        out_t = t_model(torch.from_numpy(pts), torch.from_numpy(z),
                        torch.from_numpy(dirs))
    assert_close(out_j, out_t, atol=5e-5)
