"""SRGAN generator — 16 BN residual blocks, 9x9 head/tail, Tanh output.

Reference: model/srgan.py:72-121 (GeneratorResNet).  Trained adversarially
with MSE pixel + 6e-3 VGG-content + 1e-3 LSGAN adversarial loss
(srgan.py:346-364).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.norm import BatchNorm

from sradsgan_tpu.nn.blocks import (ConvBlock, default_kernel_init,
                                    UpsampleHead)
from sradsgan_tpu.ops.pixelshuffle import pixel_shuffle


class SRGANGenerator(nn.Module):
    scale: int = 4
    num_channels: int = 3
    base_filters: int = 64
    num_residuals: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        out1 = ConvBlock(f, kernel_size=9, activation="relu",
                         dtype=self.dtype)(x)
        out = out1
        for _ in range(self.num_residuals):
            # conv-BN-ReLU-conv-BN + skip (srgan.py:58-70)
            residual = out
            out = ConvBlock(f, 3, activation="relu", norm="batch",
                            dtype=self.dtype)(out, train)
            out = ConvBlock(f, 3, activation=None, norm="batch",
                            dtype=self.dtype)(out, train)
            out = out + residual
        out = ConvBlock(f, 3, activation=None, norm="batch",
                        dtype=self.dtype)(out, train)
        out = out1 + out
        # Upsample with BN between conv and shuffle (srgan.py:94-106);
        # the reference appends ONE [conv, bn, shuffle, relu] list per
        # stage, so conv/bn weights are SHARED across stages.
        stages = UpsampleHead.stages(self.scale)
        if stages:
            r0 = stages[0]
            up_conv = nn.Conv(f * r0 * r0, (3, 3), padding="SAME",
                              kernel_init=default_kernel_init,
                              dtype=self.dtype)
            up_bn = BatchNorm(
                         use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 dtype=self.dtype)
        for r in stages:
            out = up_conv(out)
            out = up_bn(out)
            out = pixel_shuffle(out, r)
            out = nn.relu(out)
        out = nn.Conv(self.num_channels, (9, 9), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(out)
        return jnp.tanh(out)
