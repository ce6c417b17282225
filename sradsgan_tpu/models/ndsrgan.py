"""NDSRGAN generator — 23 doubly-dense DCRDB blocks, NN+conv upsampling.

Reference: model/ndsrgan.py:60-211.  CL = conv3x3+LeakyReLU(0.2); DenseBlock
= 4 CLs with dense concat + fuse conv, x + 0.2*out; DCRDB = 3 DenseBlocks
with 0.2-scaled running-sum inputs + conv, 0.2*out + x; the trunk chains 23
DCRDBs where block i consumes ``x + 0.2 * sum(m_1..m_{i-1})`` and the trunk
output is that running sum after m_23.  Head conv, trunk conv2 with skip,
nearest-neighbor+conv upsampling, two-conv tail.  Adversarial: 4x4 stride-2
patch D (ndsrgan.py:213-238), MSE GAN loss with weights
1e-2*pixel + content + 2.5e-3*adv (ndsrgan.py:429-434).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.blocks import ConvBlock, NearestConvUpsample


class DenseBlock(nn.Module):
    nf: int = 64
    nc: int = 32
    n_layers: int = 4
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        start = x
        for _ in range(self.n_layers):
            y = ConvBlock(self.nc, 3, activation="lrelu",
                          dtype=self.dtype)(x)
            x = jnp.concatenate([x, y], axis=-1)
        x = ConvBlock(self.nf, 3, dtype=self.dtype)(x)
        return start + 0.2 * x


class DCRDB(nn.Module):
    nf: int = 64
    nc: int = 32
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        out1 = DenseBlock(self.nf, self.nc, dtype=self.dtype)(x)
        out2 = DenseBlock(self.nf, self.nc, dtype=self.dtype)(x + 0.2 * out1)
        out3 = DenseBlock(self.nf, self.nc,
                          dtype=self.dtype)(x + 0.2 * out1 + 0.2 * out2)
        out4 = ConvBlock(self.nf, 3, dtype=self.dtype)(
            x + 0.2 * out1 + 0.2 * out2 + 0.2 * out3)
        return 0.2 * out4 + x


class NDSRGANGenerator(nn.Module):
    scale: int = 4
    num_channels: int = 3
    nf: int = 64
    nc: int = 32
    n_dcrdb: int = 23
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        out = ConvBlock(self.nf, 3, dtype=self.dtype)(x)
        # 23 DCRDBs with 0.2-scaled running-sum chaining (ndsrgan.py:123-158)
        acc = out
        for _ in range(self.n_dcrdb):
            m = DCRDB(self.nf, self.nc, dtype=self.dtype)(acc)
            acc = acc + 0.2 * m
        trunk = ConvBlock(self.nf, 3, dtype=self.dtype)(acc)
        out = out + trunk
        out = NearestConvUpsample(self.nf, self.scale, activation="lrelu",
                                  dtype=self.dtype)(out)
        out = ConvBlock(self.nf, 3, activation="lrelu", dtype=self.dtype)(out)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(out)


# NDSRGAN's 4x4 stride-2 markovian patch D (ndsrgan.py:213-238):
NDSRGAN_D_BLOCKS: Tuple[Tuple[int, int, bool], ...] = (
    (64, 2, False), (128, 2, True), (256, 2, True), (512, 1, True),
)
