"""Attention-augmented convolution (AA-Conv).

Reference: base_networks.py AugmentedConv:673-873 — a conv whose output
channels are partly produced by multi-head 2D self-attention with optional
relative position logits (Bello et al. 2019).  Latent in the reference's
mains but part of its public block library.

NHWC Flax version; the relative-logit rel_to_abs trick is the standard
pad/reshape sequence, all static shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.blocks import default_kernel_init


def _rel_to_abs(x: jnp.ndarray) -> jnp.ndarray:
    """(B, L, 2L-1) relative logits -> (B, L, L) absolute (static shapes)."""
    b, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, l - 1)))
    x = x.reshape(b, l + 1, 2 * l - 1)
    return x[:, :l, l - 1:]


class AugmentedConv(nn.Module):
    out_channels: int
    kernel_size: int = 3
    dk: int = 40
    dv: int = 4
    num_heads: int = 4
    relative: bool = False
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        nh = self.num_heads
        dk, dv = self.dk, self.dv
        dkh, dvh = dk // nh, dv // nh
        k = self.kernel_size
        pad = (k - 1) // 2
        s = self.stride

        conv_out = nn.Conv(self.out_channels - dv, (k, k), strides=(s, s),
                           padding=((pad, pad), (pad, pad)),
                           kernel_init=default_kernel_init,
                           dtype=self.dtype)(x)
        qkv = nn.Conv(2 * dk + dv, (k, k), strides=(s, s),
                      padding=((pad, pad), (pad, pad)),
                      kernel_init=default_kernel_init, dtype=self.dtype)(x)
        b, h, w, _ = qkv.shape
        q, kk, v = jnp.split(qkv, [dk, 2 * dk], axis=-1)
        # (B, Nh, H*W, d_head)
        split = lambda t, d: t.reshape(b, h * w, nh, d).transpose(0, 2, 1, 3)
        q = split(q, dkh) * (dkh ** -0.5)
        kk = split(kk, dkh)
        v = split(v, dvh)

        logits = jnp.einsum("bnqd,bnkd->bnqk", q, kk,
                            preferred_element_type=jnp.float32)
        if self.relative:
            rel_w = self.param("key_rel_w", nn.initializers.normal(1.0),
                               (2 * w - 1, dkh), jnp.float32)
            rel_h = self.param("key_rel_h", nn.initializers.normal(1.0),
                               (2 * h - 1, dkh), jnp.float32)
            q_sp = q.reshape(b, nh, h, w, dkh)
            # width-relative: per row, (W, 2W-1) -> abs (W, W)
            rw = jnp.einsum("bnhwd,md->bnhwm", q_sp.astype(jnp.float32),
                            rel_w)
            rw = _rel_to_abs(rw.reshape(b * nh * h, w, 2 * w - 1))
            rw = rw.reshape(b, nh, h, 1, w, w)
            rw = jnp.broadcast_to(rw, (b, nh, h, h, w, w))
            # (bn, q=(h,w), k=(h,w)) with width logits independent of k-row
            rw = rw.transpose(0, 1, 2, 4, 3, 5).reshape(b, nh, h * w, h * w)
            # height-relative: transpose spatial axes
            qt = q_sp.transpose(0, 1, 3, 2, 4)  # (b, nh, w, h, d)
            rh = jnp.einsum("bnwhd,md->bnwhm", qt.astype(jnp.float32), rel_h)
            rh = _rel_to_abs(rh.reshape(b * nh * w, h, 2 * h - 1))
            rh = rh.reshape(b, nh, w, 1, h, h)
            rh = jnp.broadcast_to(rh, (b, nh, w, w, h, h))
            # reorder (w_q, w_k, h_q, h_k) -> ((h_q w_q), (h_k w_k))
            rh = rh.transpose(0, 1, 4, 2, 5, 3).reshape(b, nh, h * w, h * w)
            logits = logits + rw + rh

        weights = jax.nn.softmax(logits.astype(jnp.float32),
                                 axis=-1).astype(v.dtype)
        attn = jnp.einsum("bnqk,bnkd->bnqd", weights, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, h, w, dv)
        attn = nn.Conv(dv, (1, 1), kernel_init=default_kernel_init,
                       dtype=self.dtype)(attn)
        return jnp.concatenate([conv_out, attn], axis=-1)
