"""Convert PyTorch checkpoints to sradsgan_tpu formats.

Three converters:

1. ``vgg19``: torchvision ``vgg19-dcbb9e9d.pth`` state dict -> npz with
   HWIO kernels for losses/vgg.py (set SRADSGAN_TPU_VGG19_NPZ to the output).
2. ``alexnet``: torchvision ``alexnet-owt-*.pth`` -> npz for losses/lpips.py
   (set SRADSGAN_TPU_ALEXNET_NPZ).
3. ``generator``: a reference ``generator_param*.pkl`` state dict -> Orbax-
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
    if len(argv) != 3 or argv[0] not in ("vgg19", "alexnet", "generator"):
        print(__doc__)
        return 1
    kind, src, dst = argv
    if kind == "vgg19":
        convert_features(src, dst, _VGG19_FEATURE_IDS)
    elif kind == "alexnet":
        convert_features(src, dst, _ALEXNET_FEATURE_IDS)
    else:
        convert_generator(src, dst)
    return 0


if __name__ == "__main__":
    sys.exit(main())
