"""LPIPS perceptual similarity (net-lin, alex) — the reference's 5th metric.

Reference: utils/PerceptualSimilarity/ (PNetLin, networks_basic.py:27-92):
scale inputs from [-1,1] with the learned shift/scale, run an AlexNet trunk,
tap the five post-ReLU feature maps, channel-normalize each, square the
difference, weight with the calibrated 1x1 linear heads, spatially average,
and sum the five layer scores.  ``normalize=True`` maps [0,1] inputs to
[-1,1] first (the reference always passes normalize=True,
model/sradsgan.py:1489).

Weights: the calibrated linear heads ship with the reference (68 KB) and are
converted into ``losses/weights/lpips_{alex,vgg,squeeze}_v01.npz`` here.
The AlexNet BACKBONE weights are torchvision-pretrained and not available in
this zero-egress image — supply a converted ``alexnet.npz`` via
``SRADSGAN_TPU_ALEXNET_NPZ`` (see tools/convert_torch.py) for numeric parity
with the reference.  Without it the backbone falls back to a fixed-seed
random init: the metric is still a self-consistent perceptual distance
(calibrated heads over random features) but NOT comparable to published
LPIPS numbers — eval output marks it ``lpips*`` in that case.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

ALEXNET_WEIGHTS_ENV = "SRADSGAN_TPU_ALEXNET_NPZ"
_WEIGHTS_DIR = os.path.join(os.path.dirname(__file__), "weights")

# LPIPS v0.1 scaling layer constants (networks_basic.py:94-105).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# torchvision AlexNet features: (out_ch, kernel, stride, padding, pool_before)
_ALEX_LAYERS = (
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)


class AlexNetFeatures(nn.Module):
    """AlexNet trunk returning the five post-ReLU taps (NHWC)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        taps = []
        for i, (ch, k, s, p, pool) in enumerate(_ALEX_LAYERS):
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(ch, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                        name=f"conv{i}", dtype=self.dtype)(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """net-lin LPIPS over AlexNet features."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, y, normalize: bool = True):
        # x, y: NHWC. normalize=True: [0,1] -> [-1,1] (reference forward).
        if normalize:
            x = 2.0 * x - 1.0
            y = 2.0 * y - 1.0
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        x = (x - shift) / scale
        y = (y - shift) / scale

        net = AlexNetFeatures(dtype=self.dtype)
        fx = net(x)
        fy = net(y)

        total = 0.0
        for i, (tx, ty) in enumerate(zip(fx, fy)):
            d = (_normalize_tensor(tx.astype(jnp.float32))
                 - _normalize_tensor(ty.astype(jnp.float32))) ** 2
            w = self.param(f"lin{i}", nn.initializers.ones,
                           (tx.shape[-1],), jnp.float32)
            score = jnp.sum(d * w[None, None, None, :], axis=-1)
            total = total + jnp.mean(score, axis=(1, 2))
        return total  # (batch,)


@functools.lru_cache(maxsize=1)
def _build_lpips():
    """Returns (jitted_fn, calibrated: bool)."""
    model = LPIPS()
    dummy = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(12345), dummy, dummy)["params"]
    params = dict(params)

    # Calibrated linear heads (bundled, converted from the reference's
    # weights/v0.1/alex.pth).
    heads = np.load(os.path.join(_WEIGHTS_DIR, "lpips_alex_v01.npz"))
    for i in range(5):
        params[f"lin{i}"] = jnp.asarray(heads[f"lin{i}"])

    calibrated = False
    backbone_path = os.environ.get(ALEXNET_WEIGHTS_ENV)
    if backbone_path and os.path.exists(backbone_path):
        data = np.load(backbone_path)
        net_params = dict(params["AlexNetFeatures_0"])
        for i in range(5):
            net_params[f"conv{i}"] = {
                "kernel": jnp.asarray(data[f"conv{i}/kernel"]),
                "bias": jnp.asarray(data[f"conv{i}/bias"]),
            }
        params["AlexNetFeatures_0"] = net_params
        calibrated = True

    fwd = jax.jit(lambda x, y: model.apply({"params": params}, x, y))
    return fwd, calibrated


def lpips_fn() -> Callable[[np.ndarray, np.ndarray], float]:
    """Single-pair LPIPS callable for the eval protocol (HWC float [0,1])."""
    fwd, _ = _build_lpips()

    def call(x01, y01) -> float:
        x = jnp.asarray(x01, jnp.float32)[None]
        y = jnp.asarray(y01, jnp.float32)[None]
        return float(fwd(x, y)[0])

    return call


def lpips_is_calibrated() -> bool:
    return _build_lpips()[1]


def batched_lpips(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Batched NHWC LPIPS (for in-training validation)."""
    fwd, _ = _build_lpips()
    return fwd(x, y)
