"""ESRGAN-family blocks and alternative architectures.

Reference: model/block.py (conv_block:109, ResNetBlock:143,
ResidualDenseBlock_5C:176, RRDB:211, pixelshuffle_block:239) and
model/architecture.py (SRResNet:13, RRDBNet:47) — the imported-but-
commented alternative generators the reference keeps around
(sradsgan.py:31,675).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.blocks import (ConvBlock, default_kernel_init,
                                    UpsampleHead)


class ResidualDenseBlock5C(nn.Module):
    """5-conv residual dense block, 0.2-scaled (block.py:176-209)."""

    nf: int = 64
    gc: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        feats = x
        for i in range(4):
            y = nn.Conv(self.gc, (3, 3), padding="SAME",
                        kernel_init=default_kernel_init,
                        dtype=self.dtype)(feats)
            y = nn.leaky_relu(y, 0.2)
            feats = jnp.concatenate([feats, y], axis=-1)
        out = nn.Conv(self.nf, (3, 3), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(feats)
        return x + 0.2 * out


class RRDB(nn.Module):
    """Residual-in-residual dense block (block.py:211-237)."""

    nf: int = 64
    gc: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype)(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype)(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, dtype=self.dtype)(out)
        return x + 0.2 * out


class RRDBNet(nn.Module):
    """ESRGAN generator (architecture.py:47-86)."""

    scale: int = 4
    num_channels: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fea = nn.Conv(self.nf, (3, 3), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(x)
        trunk = fea
        for _ in range(self.nb):
            trunk = RRDB(self.nf, self.gc, dtype=self.dtype)(trunk)
        trunk = nn.Conv(self.nf, (3, 3), padding="SAME",
                        kernel_init=default_kernel_init,
                        dtype=self.dtype)(trunk)
        fea = fea + trunk
        fea = UpsampleHead(self.nf, self.scale, activation="lrelu",
                           dtype=self.dtype)(fea)
        fea = ConvBlock(self.nf, 3, activation="lrelu", dtype=self.dtype)(fea)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(fea)


class SRResNet(nn.Module):
    """MSRResNet (architecture.py:13-45): 16 plain residual convs,
    PixelShuffle tail."""

    scale: int = 4
    num_channels: int = 3
    nf: int = 64
    nb: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        fea = ConvBlock(self.nf, 3, activation="lrelu",
                        dtype=self.dtype)(x)
        trunk = fea
        for _ in range(self.nb):
            y = ConvBlock(self.nf, 3, activation="lrelu",
                          dtype=self.dtype)(trunk)
            y = ConvBlock(self.nf, 3, dtype=self.dtype)(y)
            trunk = trunk + y
        trunk = ConvBlock(self.nf, 3, dtype=self.dtype)(trunk)
        fea = fea + trunk
        fea = UpsampleHead(self.nf, self.scale, activation="lrelu",
                           dtype=self.dtype)(fea)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(fea)
