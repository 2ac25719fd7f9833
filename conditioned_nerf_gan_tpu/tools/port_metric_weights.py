"""Port pretrained metric-net weights (torch → flat .npz for the Flax nets).

The reference scores FID/oFID with pytorch_fid's InceptionV3 and LPIPS with
the lpips package's AlexNet (reference metric_utils.py:4-37, :290). This tool
converts those torch state dicts into the flat {flax_path: array} .npz layout
consumed by eval/inception.py (CNG_INCEPTION_WEIGHTS) and eval/lpips.py
(CNG_LPIPS_WEIGHTS).

Usage (on a machine where the torch checkpoints are available):

    # pytorch_fid's FID-standard InceptionV3 (pt_inception-2015-12-05.pth),
    # or any torchvision-layout inception_v3 state dict:
    python -m conditioned_nerf_gan_tpu.tools.port_metric_weights \
        inception <state_dict.pth> <out.npz>

    # lpips AlexNet: the FULL lpips.LPIPS(net='alex') state dict (backbone +
    # linear heads; lpips ships only the lin heads in its 'weights/v0.1'
    # files — save `lpips.LPIPS(net='alex').state_dict()` once with torch):
    python -m conditioned_nerf_gan_tpu.tools.port_metric_weights \
        lpips <state_dict.pth> <out.npz>

Then: export CNG_INCEPTION_WEIGHTS=<out.npz> (resp. CNG_LPIPS_WEIGHTS).

Conversion is pure numpy renaming/transposition, golden-tested in
tests/test_metric_ports.py against torch executions of the same state dicts.
"""

from __future__ import annotations

import sys

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def _conv_kernel(w) -> np.ndarray:
    """torch conv weight (O, I, kH, kW) → flax HWIO (kH, kW, I, O)."""
    return _np(w).transpose(2, 3, 1, 0)


def convert_inception(state_dict: dict) -> dict:
    """torchvision/pytorch_fid InceptionV3 state dict → flat Flax .npz dict.

    Torch names each FID block cell `<Block>.<branch>.conv.weight` plus the
    four frozen-batchnorm tensors; the Flax module mirrors the module names
    1:1 (eval/inception.py), so the mapping is mechanical:
      X.conv.weight       → params/X/kernel   (transposed to HWIO)
      X.bn.weight         → params/X/bn_scale
      X.bn.bias           → params/X/bn_bias
      X.bn.running_mean   → params/X/bn_mean
      X.bn.running_var    → params/X/bn_var
    The 1000-way `fc` classifier head and aux classifier are dropped (FID
    taps features before them).
    """
    out = {}
    for name, tensor in state_dict.items():
        if name.startswith(("fc.", "AuxLogits.")) or name.endswith(
            "num_batches_tracked"
        ):
            continue
        if name.endswith(".conv.weight"):
            out[f"params/{name[: -len('.conv.weight')].replace('.', '/')}/kernel"] = (
                _conv_kernel(tensor)
            )
            continue
        for suffix, leaf in (
            (".bn.weight", "bn_scale"),
            (".bn.bias", "bn_bias"),
            (".bn.running_mean", "bn_mean"),
            (".bn.running_var", "bn_var"),
        ):
            if name.endswith(suffix):
                mod = name[: -len(suffix)].replace(".", "/")
                out[f"params/{mod}/{leaf}"] = _np(tensor)
                break
        else:
            raise KeyError(f"unrecognized inception key: {name}")
    return out


# lpips pretrained_networks.alexnet keeps torchvision's feature indices
# inside its slice Sequentials: conv layers live at features[0,3,6,8,10].
_LPIPS_ALEX_CONVS = {
    "net.slice1.0": 0,
    "net.slice2.3": 1,
    "net.slice3.6": 2,
    "net.slice4.8": 3,
    "net.slice5.10": 4,
}


def convert_lpips(state_dict: dict) -> dict:
    """lpips.LPIPS(net='alex') full state dict → flat Flax .npz dict.

    Maps the AlexNet backbone convs to params/alex/conv{i}_{kernel,bias} and
    the learned linear heads lin{i}.model.1.weight (1×1 conv, (1,C,1,1)) to
    params/lin{i} vectors (C,). The scaling-layer shift/scale buffers are
    validated against the constants hardcoded in eval/lpips.py.
    """
    out = {}
    for name, tensor in state_dict.items():
        if name in ("scaling_layer.shift", "scaling_layer.scale"):
            from ..eval.lpips import _SCALE, _SHIFT

            expected = _SHIFT if name.endswith("shift") else _SCALE
            got = _np(tensor).reshape(-1)
            if not np.allclose(got, expected, atol=1e-6):
                raise ValueError(f"{name} = {got} != expected {expected}")
            continue
        matched = next(
            (k for k in _LPIPS_ALEX_CONVS if name.startswith(k + ".")), None
        )
        if matched is not None:
            i = _LPIPS_ALEX_CONVS[matched]
            if name.endswith(".weight"):
                out[f"params/alex/conv{i}_kernel"] = _conv_kernel(tensor)
            elif name.endswith(".bias"):
                out[f"params/alex/conv{i}_bias"] = _np(tensor)
            else:
                raise KeyError(f"unrecognized lpips backbone key: {name}")
            continue
        if name.startswith("lin") and name.endswith(".model.1.weight"):
            i = int(name[len("lin"): name.index(".")])
            out[f"params/lin{i}"] = _np(tensor).reshape(-1)
            continue
        raise KeyError(f"unrecognized lpips key: {name}")
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 3 or argv[0] not in ("inception", "lpips"):
        print(__doc__)
        return 2
    kind, src, dst = argv
    import torch

    state_dict = torch.load(src, map_location="cpu", weights_only=True)
    if not isinstance(state_dict, dict) or "state_dict" in state_dict:
        state_dict = state_dict["state_dict"]
    flat = (convert_inception if kind == "inception" else convert_lpips)(
        state_dict
    )
    np.savez(dst, **flat)
    print(f"wrote {len(flat)} arrays to {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
