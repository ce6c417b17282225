"""Guided-diffusion-style conditional UNet for diffusion SR.

Reference: GDP_x0/model/gdp_modules/unet.py (801 LoC): timestep sinusoidal
embedding + 4x MLP (:120), ResBlocks with GroupNorm(32) scale-shift time
conditioning (:276-390), QKV self-attention at configured resolutions
(:392-527), channel mults (1,2,4,8), in_channel 6 (x_t concat bicubic-SR
conditioner), inner_channel 64 (config/gdp_train_27_216.json:44-56).

Flax/NHWC; attention resolutions are matched against the *current* feature
map size at trace time (static shapes), like the reference's ds counter.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(t: jnp.ndarray, dim: int,
                       max_period: int = 10000) -> jnp.ndarray:
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _down2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _up2(x):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")


class ResBlock(nn.Module):
    """Scale-shift-norm residual block, optionally fused with up/down
    sampling (guided-diffusion ``resblock_updown``, reference
    unet.py:276-390: h and the skip are resampled between in_layers'
    norm-silu and conv)."""

    out_ch: int
    dropout: float = 0.0
    up: bool = False
    down: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        h = nn.silu(h)
        if self.down:
            h = _down2(h)
            x = _down2(x)
        elif self.up:
            h = _up2(h)
            x = _up2(x)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME", dtype=self.dtype)(h)

        # scale-shift time conditioning (reference unet.py:348-360)
        emb_out = nn.Dense(2 * self.out_ch, dtype=self.dtype)(nn.silu(emb))
        scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
        h = nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)
        h = h * (1 + scale) + shift
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding="SAME",
                    kernel_init=nn.initializers.zeros, dtype=self.dtype)(h)

        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype)(x)
        return x + h


class AttnBlock(nn.Module):
    """QKV self-attention; heads follow guided-diffusion's
    num_head_channels=64 rule (reference unet.py:576-577)."""

    num_head_channels: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        d = c // heads
        y = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        qkv = nn.Conv(3 * c, (1, 1), dtype=self.dtype)(y)
        qkv = qkv.reshape(b, h * w, 3, heads, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
            q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), kernel_init=nn.initializers.zeros,
                      dtype=self.dtype)(out)
        return x + out


class UNet(nn.Module):
    in_channel: int = 6
    out_channel: int = 3
    inner_channel: int = 64
    channel_mults: Sequence[int] = (1, 2, 4, 8)
    attn_res: Sequence[int] = (8,)
    res_blocks: int = 2
    dropout: float = 0.0
    image_size: int = 216
    resblock_updown: bool = True  # guided-diffusion default (unet.py:581)
    dtype: Optional[Dtype] = None

    def _attn_at(self, level: int) -> bool:
        # Attention placement by DOWNSAMPLE RATE, guided-diffusion style
        # (reference unet.py:628-641 checks ``ds in attention_resolutions``
        # with ds = 2^level; the config's pixel-size "attn_res" is dead in
        # the reference's constructor).  Structure is input-size
        # independent.
        return (2 ** level) in self.attn_res

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        ch = self.inner_channel
        emb = timestep_embedding(t, ch)
        emb = nn.Dense(4 * ch, dtype=self.dtype)(emb)
        emb = nn.Dense(4 * ch, dtype=self.dtype)(nn.silu(emb))

        h = nn.Conv(ch, (3, 3), padding="SAME", dtype=self.dtype)(x)
        skips = [h]
        # down path
        for level, mult in enumerate(self.channel_mults):
            for i in range(self.res_blocks):
                h = ResBlock(ch * mult, self.dropout, dtype=self.dtype)(
                    h, emb, train)
                if self._attn_at(level):
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"attn_down_{level}_{i}")(h)
                skips.append(h)
            if level != len(self.channel_mults) - 1:
                if self.resblock_updown:
                    h = ResBlock(h.shape[-1], self.dropout, down=True,
                                 dtype=self.dtype)(h, emb, train)
                else:
                    h = nn.Conv(h.shape[-1], (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)),
                                dtype=self.dtype)(h)
                skips.append(h)

        # middle
        h = ResBlock(h.shape[-1], self.dropout, dtype=self.dtype)(h, emb,
                                                                  train)
        h = AttnBlock(dtype=self.dtype, name="attn_mid")(h)
        h = ResBlock(h.shape[-1], self.dropout, dtype=self.dtype)(h, emb,
                                                                  train)

        # up path
        for level, mult in reversed(list(enumerate(self.channel_mults))):
            for i in range(self.res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = ResBlock(ch * mult, self.dropout, dtype=self.dtype)(
                    h, emb, train)
                if self._attn_at(level):
                    h = AttnBlock(dtype=self.dtype,
                                  name=f"attn_up_{level}_{i}")(h)
            if level != 0:
                if self.resblock_updown:
                    h = ResBlock(h.shape[-1], self.dropout, up=True,
                                 dtype=self.dtype)(h, emb, train)
                else:
                    h = _up2(h)
                    h = nn.Conv(h.shape[-1], (3, 3), padding="SAME",
                                dtype=self.dtype)(h)

        h = nn.GroupNorm(num_groups=32, dtype=self.dtype)(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channel, (3, 3), padding="SAME",
                       kernel_init=nn.initializers.zeros,
                       dtype=self.dtype)(h)
