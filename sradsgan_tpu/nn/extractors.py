"""Configurable feature extractors and the MINC texture classifier.

Reference: model/architecture.py — ``VGGFeatureExtractor``:328 (VGG19
truncated at an arbitrary feature layer, optional BN and input
normalization), ``ResNet101FeatureExtractor``:360, MINC VGG-style texture
net :384-443.  Latent in the reference mains but part of its public
architecture surface; weights load through tools/convert_torch.py-style
npz files when available (zero-egress image has no pretrained caches —
see losses/vgg.py for the policy).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.norm import BatchNorm

# VGG19 conv plan: (channels, convs-per-stage)
_VGG19_PLAN: Tuple[Tuple[int, int], ...] = ((64, 2), (128, 2), (256, 4),
                                            (512, 4), (512, 4))

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


class VGGFeatureExtractor(nn.Module):
    """VGG19 features up to ``feature_layer`` (torchvision indexing).

    Reference architecture.py:328-358: feature_layer=34 default (conv5_4),
    optional BN variant and ImageNet normalization of [0, 1] inputs.
    """

    feature_layer: int = 34
    use_bn: bool = False
    use_input_norm: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_input_norm:
            x = (x - jnp.asarray(_IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                _IMAGENET_STD, x.dtype)
        idx = 0
        step = 3 if self.use_bn else 2  # conv(+bn)+relu per torchvision idx
        for stage, (ch, n_convs) in enumerate(_VGG19_PLAN):
            for c in range(n_convs):
                if idx > self.feature_layer:
                    return x
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"conv{stage + 1}_{c + 1}",
                            dtype=self.dtype)(x)
                idx += 1
                if self.use_bn:
                    x = BatchNorm(
                                     use_running_average=not train,
                                     dtype=self.dtype)(x)
                    idx += 1
                if idx > self.feature_layer:
                    return x
                x = nn.relu(x)
                idx += 1
            if idx > self.feature_layer:
                return x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            idx += 1
        return x


class _Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = BatchNorm(
                         use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False, dtype=self.dtype)(y)
        y = BatchNorm(
                         use_running_average=not train, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = BatchNorm(
                         use_running_average=not train, dtype=self.dtype)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride,) * 2, use_bias=False,
                               dtype=self.dtype)(x)
            residual = BatchNorm(
                                    use_running_average=not train,
                                    dtype=self.dtype)(residual)
        return nn.relu(y + residual)


class ResNet101FeatureExtractor(nn.Module):
    """ResNet-101 trunk (conv1..layer3) with ImageNet input normalization.

    Reference architecture.py:360-382 uses torchvision resnet101 children
    [:8]; this is the equivalent bottleneck trunk (3/4/23 blocks).
    """

    use_input_norm: bool = True
    stage_blocks: Sequence[int] = (3, 4, 23)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_input_norm:
            x = (x - jnp.asarray(_IMAGENET_MEAN, x.dtype)) / jnp.asarray(
                _IMAGENET_STD, x.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(
                         use_running_average=not train, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, blocks in enumerate(self.stage_blocks):
            feats = 64 * (2 ** stage)
            for b in range(blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = _Bottleneck(feats, stride, dtype=self.dtype)(x, train)
        return x


class MINCNet(nn.Module):
    """MINC-trained VGG-style texture feature net
    (reference architecture.py:384-443)."""

    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        plan = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        for stage, (ch, n_convs) in enumerate(plan):
            for c in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME",
                            name=f"conv{stage + 1}{c + 1}",
                            dtype=self.dtype)(x)
                is_last = stage == len(plan) - 1 and c == n_convs - 1
                if not is_last:
                    x = nn.relu(x)
            if stage < len(plan) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x
