"""Sub-pixel (pixel shuffle) ops in NHWC with torch channel ordering.

All nine reference upsample heads use ``nn.PixelShuffle`` after a channel-
expanding conv (e.g. model/sradsgan.py:380-394); keeping torch's channel
ordering ``c * r^2 + dy * r + dx`` makes PyTorch-checkpoint import exact.
Pure reshape/transpose — XLA lowers it to a layout change fused into the
surrounding convs.
"""

from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C), torch ``PixelShuffle`` order."""
    b, h, w, c = x.shape
    r = factor
    oc = c // (r * r)
    x = x.reshape(b, h, w, oc, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, ry, w, rx, oc
    return x.reshape(b, h * r, w * r, oc)


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r), inverse of :func:`pixel_shuffle`."""
    b, hr, wr, c = x.shape
    r = factor
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, ry, rx
    return x.reshape(b, h, w, c * r * r)
