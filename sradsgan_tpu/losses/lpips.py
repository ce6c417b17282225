"""LPIPS perceptual similarity (net-lin, alex/vgg/squeeze) — the
reference's 5th metric.

Reference: utils/PerceptualSimilarity/ (PNetLin, networks_basic.py:27-92):
scale inputs from [-1,1] with the learned shift/scale, run a feature trunk,
tap the post-ReLU feature maps, channel-normalize each, square the
difference, weight with the calibrated 1x1 linear heads, spatially average,
and sum the layer scores.  ``normalize=True`` maps [0,1] inputs to
[-1,1] first (the reference always passes normalize=True,
model/sradsgan.py:1489).  All three reference trunks are supported
(dist_model.py:45-76): AlexNet (5 taps, the default), VGG16 (5 taps —
relu{1_2,2_2,3_3,4_3,5_3}), SqueezeNet 1.1 (7 taps)
(pretrained_networks.py:12-181).

Weights: the calibrated linear heads ship with the reference (68 KB) and are
converted into ``losses/weights/lpips_{alex,vgg,squeeze}_v01.npz`` here.
The trunk BACKBONE weights are torchvision-pretrained and not available in
this zero-egress image — supply converted npz files via
``SRADSGAN_TPU_{ALEXNET,VGG16,SQUEEZENET}_NPZ`` (see tools/convert_torch.py)
for numeric parity with the reference.  Without them the backbone falls back
to a fixed-seed random init: the metric is still a self-consistent
perceptual distance (calibrated heads over random features) but NOT
comparable to published LPIPS numbers — eval output marks it ``lpips*`` in
that case.
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
VGG16_WEIGHTS_ENV = "SRADSGAN_TPU_VGG16_NPZ"
SQUEEZENET_WEIGHTS_ENV = "SRADSGAN_TPU_SQUEEZENET_NPZ"
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


class VGG16Features(nn.Module):
    """VGG16 trunk returning the five reference taps — relu1_2, relu2_2,
    relu3_3, relu4_3, relu5_3 (pretrained_networks.py:96-141)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        taps = []
        idx = 0
        for b, (ch, n) in enumerate(((64, 2), (128, 2), (256, 3),
                                     (512, 3), (512, 3))):
            if b > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for _ in range(n):
                x = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                            name=f"conv{idx}", dtype=self.dtype)(x)
                x = nn.relu(x)
                idx += 1
            taps.append(x)
        return taps


def _ceil_max_pool(x, k=3, s=2):
    """torch MaxPool2d(ceil_mode=True): pad right/bottom so the last
    partial window is kept (squeezenet1_1's pools)."""
    h, w = x.shape[1], x.shape[2]
    out_h = -(-(h - k) // s) + 1
    out_w = -(-(w - k) // s) + 1
    pad_h = max((out_h - 1) * s + k - h, 0)
    pad_w = max((out_w - 1) * s + k - w, 0)
    return nn.max_pool(x, (k, k), strides=(s, s),
                       padding=((0, pad_h), (0, pad_w)))


class _Fire(nn.Module):
    """SqueezeNet fire module: 1x1 squeeze + relu, then parallel 1x1 and
    3x3 expands + relu, channel-concat."""

    squeeze: int
    expand: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.squeeze, (1, 1), name="squeeze",
                            dtype=self.dtype)(x))
        e1 = nn.relu(nn.Conv(self.expand, (1, 1), name="expand1x1",
                             dtype=self.dtype)(x))
        e3 = nn.relu(nn.Conv(self.expand, (3, 3), padding=((1, 1), (1, 1)),
                             name="expand3x3", dtype=self.dtype)(x))
        return jnp.concatenate([e1, e3], axis=-1)


# squeezenet1_1 fire plan: (squeeze, expand) per fire module; pools sit
# before fires 0, 2 and 4; taps after relu1 and fires 1, 3, 4, 5, 6, 7
# (pretrained_networks.py:6-54).
_SQUEEZE_FIRES = ((16, 64), (16, 64), (32, 128), (32, 128),
                  (48, 192), (48, 192), (64, 256), (64, 256))


class SqueezeNetFeatures(nn.Module):
    """SqueezeNet 1.1 trunk returning the seven reference taps."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        taps = []
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding="VALID",
                    name="conv0", dtype=self.dtype)(x)
        x = nn.relu(x)
        taps.append(x)                       # relu1
        for i, (sq, ex) in enumerate(_SQUEEZE_FIRES):
            if i in (0, 2, 4):
                x = _ceil_max_pool(x)
            x = _Fire(sq, ex, name=f"fire{i}", dtype=self.dtype)(x)
            if i in (1, 3, 4, 5, 6, 7):
                taps.append(x)
        return taps


_NETS = {
    "alex": (AlexNetFeatures, 5, ALEXNET_WEIGHTS_ENV, "AlexNetFeatures_0"),
    "vgg": (VGG16Features, 5, VGG16_WEIGHTS_ENV, "VGG16Features_0"),
    "squeeze": (SqueezeNetFeatures, 7, SQUEEZENET_WEIGHTS_ENV,
                "SqueezeNetFeatures_0"),
}


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nn.Module):
    """net-lin LPIPS over alex / vgg / squeeze features
    (dist_model.py:45-76)."""

    net: str = "alex"
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

        net = _NETS[self.net][0](dtype=self.dtype)
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


def _nest_npz(data) -> dict:
    """'a/b/kernel'-keyed npz -> nested param dict."""
    out: dict = {}
    for key in data.files:
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return out


@functools.lru_cache(maxsize=3)
def _build_lpips(net: str = "alex"):
    """Returns (jitted_fn, calibrated: bool) for the given trunk."""
    _, n_taps, env_var, scope = _NETS[net]
    model = LPIPS(net=net)
    dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(12345), dummy, dummy)["params"]
    params = dict(params)

    # Calibrated linear heads (bundled, converted from the reference's
    # weights/v0.1/{alex,vgg,squeeze}.pth).
    heads = np.load(os.path.join(_WEIGHTS_DIR, f"lpips_{net}_v01.npz"))
    for i in range(n_taps):
        params[f"lin{i}"] = jnp.asarray(heads[f"lin{i}"])

    calibrated = False
    backbone_path = os.environ.get(env_var)
    if backbone_path and os.path.exists(backbone_path):
        loaded = _nest_npz(np.load(backbone_path))
        net_params = dict(params[scope])
        net_params.update(loaded)
        params[scope] = net_params
        calibrated = True

    fwd = jax.jit(lambda x, y: model.apply({"params": params}, x, y))
    return fwd, calibrated


def lpips_fn(net: str = "alex") -> Callable[[np.ndarray, np.ndarray], float]:
    """Single-pair LPIPS callable for the eval protocol (HWC float [0,1])."""
    fwd, _ = _build_lpips(net)

    def call(x01, y01) -> float:
        x = jnp.asarray(x01, jnp.float32)[None]
        y = jnp.asarray(y01, jnp.float32)[None]
        return float(fwd(x, y)[0])

    return call


def lpips_is_calibrated(net: str = "alex") -> bool:
    return _build_lpips(net)[1]


def batched_lpips(x: jnp.ndarray, y: jnp.ndarray,
                  net: str = "alex") -> jnp.ndarray:
    """Batched NHWC LPIPS (for in-training validation)."""
    fwd, _ = _build_lpips(net)
    return fwd(x, y)
