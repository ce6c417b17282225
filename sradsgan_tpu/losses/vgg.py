"""VGG19 perceptual feature extractor (content loss).

Reference: every GAN trainer builds ``vgg19(pretrained=True).features[:12]``
— conv1_1..relu3_1, i.e. features after the 11th layer — and feeds SR/HR
images straight in WITHOUT ImageNet normalization (model/sradsgan.py:89-99,
srgan.py:44-56).  We reproduce that exact truncation and (non-)normalization.

Pretrained weights: torchvision is not bundled in this environment and there
is no network egress, so weights must be supplied as a converted ``.npz``
(see tools/convert_torch.py for the converter from a torchvision
``vgg19-dcbb9e9d.pth`` state dict).  Without a weights file the module falls
back to a fixed-seed random init — the perceptual loss then still regularizes
structure (random VGG features are a known-usable perceptual signal) but is
not numerically comparable to the reference; load real weights for parity.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

# (name, out_channels, followed_by_pool) for features[:12] of VGG19.
_LAYERS = (
    ("conv1_1", 64, False),
    ("conv1_2", 64, True),
    ("conv2_1", 128, False),
    ("conv2_2", 128, True),
    ("conv3_1", 256, False),
)

DEFAULT_WEIGHTS_ENV = "SRADSGAN_TPU_VGG19_NPZ"


class VGG19Features(nn.Module):
    """conv1_1..relu3_1 of VGG19 (torchvision ``features[:12]``)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        for name, ch, pool in _LAYERS:
            x = nn.Conv(ch, (3, 3), padding="SAME", name=name,
                        dtype=self.dtype)(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def load_vgg19_params(path: Optional[str] = None) -> Optional[dict]:
    """Load converted VGG19 weights from .npz; returns a Flax param dict.

    The .npz layout is ``{name}/kernel`` in HWIO and ``{name}/bias``,
    produced by tools/convert_torch.py.  Returns None if no file found.
    """
    path = path or os.environ.get(DEFAULT_WEIGHTS_ENV)
    if not path or not os.path.exists(path):
        return None
    data = np.load(path)
    params = {}
    for name, _, _ in _LAYERS:
        params[name] = {
            "kernel": jnp.asarray(data[f"{name}/kernel"]),
            "bias": jnp.asarray(data[f"{name}/bias"]),
        }
    return {"params": params}
