"""DRCAN generator — RCAN with 5 residual groups x 10 RCAB, reduction 4.

Reference: model/drcan.py:95-199 (CALayer/RCAB/ResidualGroup/RCAN),
instantiated with n_resgroups=5, n_resblocks=10, n_feats=64, reduction=4.
Trained adversarially (WGAN-GP) against base_networks.Discriminator in the
reference trainer (drcan.py:508-521).
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from sradsgan_tpu.nn.attention import CALayer
from sradsgan_tpu.nn.blocks import ConvBlock, UpsampleHead


class RCAB(nn.Module):
    """conv-ReLU-conv + channel attention, residual (drcan.py:115-134)."""

    features: int
    reduction: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        y = ConvBlock(self.features, 3, activation="relu",
                      dtype=self.dtype)(x)
        y = ConvBlock(self.features, 3, dtype=self.dtype)(y)
        y = CALayer(self.reduction, dtype=self.dtype)(y)
        return x + y


class DRCAN(nn.Module):
    scale: int = 4
    num_channels: int = 3
    n_feats: int = 64
    n_resgroups: int = 5
    n_resblocks: int = 10
    reduction: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(self.n_feats, 3, dtype=self.dtype)(x)
        res = x
        for _ in range(self.n_resgroups):
            g_in = res
            for _ in range(self.n_resblocks):
                res = RCAB(self.n_feats, self.reduction,
                           dtype=self.dtype)(res)
            res = ConvBlock(self.n_feats, 3, dtype=self.dtype)(res)
            res = res + g_in
        res = ConvBlock(self.n_feats, 3, dtype=self.dtype)(res)
        res = res + x
        # RCAN tail: Upsampler(act=False) + conv out (drcan.py:178-181)
        res = UpsampleHead(self.n_feats, self.scale, activation=None,
                           dtype=self.dtype)(res)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(res)
