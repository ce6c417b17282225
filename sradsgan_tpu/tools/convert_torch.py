"""Convert PyTorch checkpoints to sradsgan_tpu formats.

Five converters:

1. ``vgg19``: torchvision ``vgg19-dcbb9e9d.pth`` state dict -> npz with
   HWIO kernels for losses/vgg.py (set SRADSGAN_TPU_VGG19_NPZ to the output).
2. ``alexnet``: torchvision ``alexnet-owt-*.pth`` -> npz for losses/lpips.py
   (set SRADSGAN_TPU_ALEXNET_NPZ).
3. ``vgg16``: torchvision ``vgg16-*.pth`` -> npz for the LPIPS vgg trunk
   (set SRADSGAN_TPU_VGG16_NPZ).
4. ``squeezenet``: torchvision ``squeezenet1_1-*.pth`` -> npz for the LPIPS
   squeeze trunk (set SRADSGAN_TPU_SQUEEZENET_NPZ).
5. ``generator``: a reference ``generator_param*.pkl`` state dict -> Orbax-
   loadable param pytree npz, for cross-framework parity checks.  Layout
   mapping: torch OIHW conv -> flax HWIO; Linear (o,i) -> (i,o).

Usage:
    python -m sradsgan_tpu.tools.convert_torch vgg19 vgg19.pth vgg19.npz
"""

from __future__ import annotations

import sys

import numpy as np


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


_VGG19_FEATURE_IDS = {  # torchvision features index -> our layer name
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2", 10: "conv3_1",
}

_ALEXNET_FEATURE_IDS = {0: "conv0", 3: "conv1", 6: "conv2", 8: "conv3",
                        10: "conv4"}

# torchvision vgg16 features conv indices -> losses/lpips.py VGG16Features
# names (13 convs; taps at relu1_2/2_2/3_3/4_3/5_3 per
# pretrained_networks.py:96-141)
_VGG16_FEATURE_IDS = {idx: f"conv{i}" for i, idx in enumerate(
    (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28))}

# torchvision squeezenet1_1 features: conv at 0, fire modules at these
# indices (pretrained_networks.py:6-31)
_SQUEEZE_FIRE_IDS = (3, 4, 6, 7, 9, 10, 11, 12)


def _load_torch_state(path: str):
    import torch
    state = torch.load(path, map_location="cpu")
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    return {k: v.numpy() for k, v in state.items()}


def convert_features(path: str, out: str, table) -> None:
    state = _load_torch_state(path)
    npz = {}
    for idx, name in table.items():
        npz[f"{name}/kernel"] = _oihw_to_hwio(
            state[f"features.{idx}.weight"]).astype(np.float32)
        npz[f"{name}/bias"] = state[f"features.{idx}.bias"].astype(np.float32)
    np.savez(out, **npz)
    print(f"wrote {out}: {sorted(npz)}")


def convert_squeezenet(path: str, out: str) -> None:
    state = _load_torch_state(path)
    npz = {
        "conv0/kernel": _oihw_to_hwio(
            state["features.0.weight"]).astype(np.float32),
        "conv0/bias": state["features.0.bias"].astype(np.float32),
    }
    for j, idx in enumerate(_SQUEEZE_FIRE_IDS):
        for part in ("squeeze", "expand1x1", "expand3x3"):
            npz[f"fire{j}/{part}/kernel"] = _oihw_to_hwio(
                state[f"features.{idx}.{part}.weight"]).astype(np.float32)
            npz[f"fire{j}/{part}/bias"] = state[
                f"features.{idx}.{part}.bias"].astype(np.float32)
    np.savez(out, **npz)
    print(f"wrote {out}: {len(npz)} tensors")


def convert_generator(path: str, out: str) -> None:
    state = _load_torch_state(path)
    npz = {}
    for key, val in state.items():
        if val.ndim == 4:
            npz[key] = _oihw_to_hwio(val).astype(np.float32)
        elif val.ndim == 2:
            npz[key] = val.T.astype(np.float32)
        else:
            npz[key] = val.astype(np.float32)
    np.savez(out, **npz)
    print(f"wrote {out}: {len(npz)} tensors")


def main(argv=None) -> int:
    argv = argv or sys.argv[1:]
    kinds = ("vgg19", "alexnet", "vgg16", "squeezenet", "generator")
    if len(argv) != 3 or argv[0] not in kinds:
        print(__doc__)
        return 1
    kind, src, dst = argv
    if kind == "vgg19":
        convert_features(src, dst, _VGG19_FEATURE_IDS)
    elif kind == "alexnet":
        convert_features(src, dst, _ALEXNET_FEATURE_IDS)
    elif kind == "vgg16":
        convert_features(src, dst, _VGG16_FEATURE_IDS)
    elif kind == "squeezenet":
        convert_squeezenet(src, dst)
    else:
        convert_generator(src, dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
