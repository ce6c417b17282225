"""DSSR generator — wide-activation blocks with per-group upsample-and-sum.

Reference: model/dssr.py:84-177.  3 ResGroups x 10 WAB; a WAB is a 4x-wide
conv pair (ReLU between) + avg-pool-only channel attention, residual
(dssr.py:84-105, CA at :69-83).  The distinctive piece is the dense output:
ONE shared upsample head (no activation, dssr.py:124-146) is applied to the
head conv output and to every group output, and the upsampled maps are
summed (dssr.py:170-177).  Pixel loss only.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from sradsgan_tpu.nn.attention import ChannelGate
from sradsgan_tpu.nn.blocks import ConvBlock, UpsampleHead


class WAB(nn.Module):
    """Wide-activation block: 64->256 conv, ReLU, 256->64 conv, CA, +x."""

    features: int = 64
    expand: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        out = ConvBlock(self.expand * self.features, 3, activation="relu",
                        dtype=self.dtype)(x)
        out = ConvBlock(self.features, 3, dtype=self.dtype)(out)
        out = ChannelGate(ratio=16, pool_mode="Avg", dtype=self.dtype)(out)
        return out + x


class DSSRGroup(nn.Module):
    """10 WABs + conv + skip (dssr.py:106-123)."""

    features: int = 64
    n_blocks: int = 10
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        out = x
        for _ in range(self.n_blocks):
            out = WAB(self.features, dtype=self.dtype)(out)
        out = ConvBlock(self.features, 3, dtype=self.dtype)(out)
        return out + x


class DSSR(nn.Module):
    scale: int = 4
    num_channels: int = 3
    n_feats: int = 64
    n_groups: int = 3
    n_blocks: int = 10
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBlock(self.n_feats, 3, dtype=self.dtype)(x)
        # Shared upsample head applied to every tap (dssr.py:170-176).
        up = UpsampleHead(self.n_feats, self.scale, activation=None,
                          share_stages=True, dtype=self.dtype)
        out_all = up(out)
        for _ in range(self.n_groups):
            out = DSSRGroup(self.n_feats, self.n_blocks,
                            dtype=self.dtype)(out)
            out_all = out_all + up(out)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(out_all)
