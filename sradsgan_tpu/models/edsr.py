"""EDSR generator — deep residual SR CNN, pixel-loss only.

Reference: model/edsr.py:23-76 (Net), instantiated with base_filter=256,
num_residuals=32 (edsr.py:157).  Plain conv head, 32 no-norm ReLU residual
blocks, mid conv with global skip, shared sub-pixel upsample tail
(LeakyReLU 0.01), plain conv out.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from sradsgan_tpu.nn.blocks import ConvBlock, ResBlock, UpsampleHead


class EDSR(nn.Module):
    scale: int = 4
    num_channels: int = 3
    base_filters: int = 256
    num_residuals: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.base_filters, 3, dtype=self.dtype)(x)
        residual = x
        for _ in range(self.num_residuals):
            x = ResBlock(self.base_filters, activation="relu", norm=None,
                         dtype=self.dtype)(x)
        x = ConvBlock(self.base_filters, 3, dtype=self.dtype)(x)
        x = x + residual
        x = UpsampleHead(self.base_filters, self.scale, activation="lrelu01",
                         share_stages=True, dtype=self.dtype)(x)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(x)
