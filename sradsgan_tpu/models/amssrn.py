"""AMSSRN generator — multi-scale dense blocks, non-local attention, FPN fusion.

Reference: model/amssrn.py:74-334.  Components:

- RB: x + conv3x3(x) + conv-PReLU-conv(x) (amssrn.py:185-198);
- ASPP over 4x-concat features with dilations 1/2/3, PReLU each
  (amssrn.py:200-217);
- DB: 4 chained RBs, concat(input, c1..c4) -> CALayer(PReLU, r=16) -> 1x1,
  + input (amssrn.py:219-240);
- DB_ASPP: 4 chained RBs, concat(c1..c4) -> ASPP -> CALayer -> 1x1, + input
  (amssrn.py:242-261);
- quadrant-wise non-local attention with zero-init output conv
  (amssrn.py:93-165);
- FPN fusion over 11 taps + 1x1 feature bank (amssrn.py:263-334).

Pixel loss only.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.blocks import (ConvBlock, default_kernel_init, PReLU,
                                    UpsampleHead)


class AmssrnCALayer(nn.Module):
    """RCAN-style CA but with PReLU (amssrn.py:166-183)."""

    reduction: int = 16
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(max(c // self.reduction, 1),
                     kernel_init=default_kernel_init, dtype=self.dtype)(s)
        s = PReLU(dtype=self.dtype)(s)
        s = nn.Dense(c, kernel_init=default_kernel_init, dtype=self.dtype)(s)
        return nn.sigmoid(s)[:, None, None, :] * x


class RB(nn.Module):
    features: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        branch1 = ConvBlock(self.features, 3, dtype=self.dtype)(x)
        y = ConvBlock(self.features, 3, dtype=self.dtype)(x)
        y = PReLU(dtype=self.dtype)(y)
        y = ConvBlock(self.features, 3, dtype=self.dtype)(y)
        return x + branch1 + y


class DB(nn.Module):
    features: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c1 = RB(self.features, dtype=self.dtype)(x)
        c2 = RB(self.features, dtype=self.dtype)(c1)
        c3 = RB(self.features, dtype=self.dtype)(c2)
        c4 = RB(self.features, dtype=self.dtype)(c3)
        cat = jnp.concatenate([x, c1, c2, c3, c4], axis=-1)
        cat = AmssrnCALayer(dtype=self.dtype)(cat)
        out = nn.Conv(self.features, (1, 1), kernel_init=default_kernel_init,
                      dtype=self.dtype)(cat)
        return out + x


class DBASPP(nn.Module):
    features: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c1 = RB(self.features, dtype=self.dtype)(x)
        c2 = RB(self.features, dtype=self.dtype)(c1)
        c3 = RB(self.features, dtype=self.dtype)(c2)
        c4 = RB(self.features, dtype=self.dtype)(c3)
        cat = jnp.concatenate([c1, c2, c3, c4], axis=-1)
        # ASPP: 3 parallel dilated convs, PReLU each (amssrn.py:200-217)
        branches = []
        for d in (1, 2, 3):
            b = nn.Conv(cat.shape[-1], (3, 3), padding="SAME",
                        kernel_dilation=(d, d),
                        kernel_init=default_kernel_init, dtype=self.dtype)(cat)
            branches.append(PReLU(dtype=self.dtype)(b))
        cat = jnp.concatenate(branches, axis=-1)
        cat = AmssrnCALayer(dtype=self.dtype)(cat)
        out = nn.Conv(self.features, (1, 1), kernel_init=default_kernel_init,
                      dtype=self.dtype)(cat)
        return out + x


class NonLocalBlock(nn.Module):
    """Embedded-gaussian non-local block, zero-init W (amssrn.py:93-136)."""

    inter_features: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inner = self.inter_features
        g = nn.Conv(inner, (1, 1), kernel_init=default_kernel_init,
                    dtype=self.dtype)(x).reshape(b, h * w, inner)
        theta = nn.Conv(inner, (1, 1), kernel_init=default_kernel_init,
                        dtype=self.dtype)(x).reshape(b, h * w, inner)
        phi = nn.Conv(inner, (1, 1), kernel_init=default_kernel_init,
                      dtype=self.dtype)(x).reshape(b, h * w, inner)
        f = jnp.einsum("bqd,bkd->bqk", theta, phi)
        attn = nn.softmax(f, axis=-1)
        y = jnp.einsum("bqk,bkd->bqd", attn, g).reshape(b, h, w, inner)
        y = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, dtype=self.dtype)(y)
        return y + x


class QuadrantNonLocal(nn.Module):
    """Apply a shared non-local block to the 4 spatial quadrants
    (amssrn.py:137-165)."""

    inter_features: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        h1, w1 = h // 2, w // 2
        block = NonLocalBlock(self.inter_features, dtype=self.dtype)
        lu = block(x[:, :h1, :w1])
        ld = block(x[:, h1:, :w1])
        ru = block(x[:, :h1, w1:])
        rd = block(x[:, h1:, w1:])
        top = jnp.concatenate([lu, ru], axis=2)
        bot = jnp.concatenate([ld, rd], axis=2)
        return jnp.concatenate([top, bot], axis=1)


class AMSSRN(nn.Module):
    scale: int = 4
    num_channels: int = 3
    n_feats: int = 64
    n_blocks: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.n_feats
        head = ConvBlock(f, 3, dtype=self.dtype)(x)
        nl1 = QuadrantNonLocal(f // 8, dtype=self.dtype)(head)
        gamma = self.param("gamma", nn.initializers.zeros, (1,),
                           jnp.float32).astype(head.dtype)

        taps: List[jnp.ndarray] = [head, nl1]
        out = nl1
        for i in range(self.n_blocks):
            if i < self.n_blocks // 2:
                out = DB(f, dtype=self.dtype)(out)
            else:
                out = DBASPP(f, dtype=self.dtype)(out)
            out = out + gamma * nl1
            taps.append(out)
        taps.append(QuadrantNonLocal(f // 8, dtype=self.dtype)(taps[-1]))

        # FPN fusion over the 11 taps (amssrn.py:263-280)
        fused = [nn.Conv(f, (3, 3), padding="SAME",
                         kernel_init=default_kernel_init,
                         dtype=self.dtype)(taps[-1])]
        for i in range(len(taps) - 1):
            s = taps[-(i + 2)] + taps[-(i + 1)]
            fused.append(nn.Conv(f, (3, 3), padding="SAME",
                                 kernel_init=default_kernel_init,
                                 dtype=self.dtype)(s))
        bank = nn.Conv(f, (1, 1), kernel_init=default_kernel_init,
                       dtype=self.dtype)(jnp.concatenate(fused, axis=-1))
        bottleneck = head + bank
        out = UpsampleHead(f, self.scale, activation=None,
                           dtype=self.dtype)(bottleneck)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(out)
