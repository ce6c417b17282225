"""SRAGAN generator — local CA-SA attention blocks + global CAM/PAM attention.

Reference: model/sragan.py:147-237.  conv1 (LeakyReLU 0.01); 12 groups
(base_networks.ResidualBlock_Block_WithAttention:1505) each of 5 BasicBlocks
(base_networks.py:958-1071; conv-lrelu-conv + CA-SA local attention + 1x1,
residual, post-activation lrelu except the last CNA block) plus group-level
CA-SA + 1x1 and skip; conv2+BN with global skip; CAM/PAM global dual
attention + 1x1; BN'd sub-pixel upsampling; tanh output.  WGAN-GP training.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.norm import BatchNorm

from sradsgan_tpu.nn.attention import GlobalAttention, LocalAttention
from sradsgan_tpu.nn.blocks import ConvBlock, default_kernel_init, UpsampleHead
from sradsgan_tpu.ops.pixelshuffle import pixel_shuffle


class BasicAttentionBlock(nn.Module):
    """base_networks.BasicBlock: conv(act)-conv + CA-SA + 1x1, +x, post-act."""

    features: int = 64
    la_mode: str = "CA-SA"
    pool_mode: str = "Avg|Max"
    add_conv: bool = True
    activation: Optional[str] = "lrelu"  # None for the CNA-terminal block
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        out = ConvBlock(self.features, 3, activation=self.activation,
                        dtype=self.dtype)(x)
        out = ConvBlock(self.features, 3, dtype=self.dtype)(out)
        out = LocalAttention(self.la_mode, self.pool_mode, self.add_conv,
                             dtype=self.dtype)(out)
        out = out + x
        if self.activation == "lrelu":
            out = nn.leaky_relu(out, 0.2)
        return out


class SRAGANGroup(nn.Module):
    """ResidualBlock_Block_WithAttention: (n-1) blocks + CNA block + rla, +x."""

    features: int = 64
    n_blocks: int = 5
    rla_mode: str = "CA-SA"
    bla_mode: str = "CA-SA"
    pool_mode: str = "Avg|Max"
    add_conv: bool = True
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        out = x
        for _ in range(self.n_blocks - 1):
            out = BasicAttentionBlock(self.features, self.bla_mode,
                                      self.pool_mode, self.add_conv,
                                      activation="lrelu",
                                      dtype=self.dtype)(out)
        out = BasicAttentionBlock(self.features, self.bla_mode,
                                  self.pool_mode, self.add_conv,
                                  activation=None, dtype=self.dtype)(out)
        out = LocalAttention(self.rla_mode, self.pool_mode, self.add_conv,
                             dtype=self.dtype)(out)
        return out + x


class SRAGANGenerator(nn.Module):
    scale: int = 4
    num_channels: int = 3
    base_filters: int = 64
    n_groups: int = 12
    n_blocks: int = 5
    ga_mode: str = "CA-SA"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        out1 = nn.Conv(f, (3, 3), padding="SAME",
                       kernel_init=default_kernel_init, dtype=self.dtype)(x)
        out1 = nn.leaky_relu(out1, 0.01)
        out = out1
        for _ in range(self.n_groups):
            out = SRAGANGroup(f, self.n_blocks, dtype=self.dtype)(out)
        out = nn.Conv(f, (3, 3), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(out)
        out = BatchNorm(
                         use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype)(out)
        out = out1 + out
        # Global CAM (channel) then PAM (spatial) + 1x1 (sragan.py:216-227)
        out = GlobalAttention(self.ga_mode, add_conv=True,
                              dtype=self.dtype)(out)
        # BN'd sub-pixel upsampling (sragan.py:183-197); conv/bn SHARED
        # across stages (the reference appends one module list repeatedly)
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
            out = nn.leaky_relu(out, 0.01)
        out = nn.Conv(self.num_channels, (3, 3), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(out)
        return jnp.tanh(out)
