"""HAT — Hybrid Attention Transformer SR generator.

Reference: model/hat.py:151-877.  Six RHAG groups x six HAB blocks
(shifted-window MSA + parallel conv channel-attention branch scaled 0.01)
plus one overlapping cross-attention block (OCAB) per group; embed_dim 96,
6 heads, window 9 for scales 2/4/8 and 8 for 3/9 (hat.py:624-625), MLP
ratio 4 (2 in OCAB), ImageNet-ish RGB mean shift, classical pixelshuffle
reconstruction.  Pixel loss only (hat.py:1071).

TPU-native choices:
- everything stays NHWC with static shapes; window partition/reverse are
  reshape/transposes XLA folds into layout changes;
- the SW-MSA attention mask and both relative-position index tables are
  computed with numpy AT TRACE TIME from static shapes and embedded as
  constants (the reference precomputes them as buffers, hat.py:763-822);
- relative-position bias lookup is a static-index gather from the learned
  table — no dynamic gather on device;
- OCAB's overlapping k/v windows come from a pad + strided-slice stack
  (static window grid), not an im2col unfold.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.blocks import ConvBlock, UpsampleHead

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def _attn_impl() -> str:
    """Round-5 HAT attention formulation (docs/PERF.md round-5 campaign).

    Default ``nt``: q/k/v stay in (B, N, heads, d) layout and dot_general
    carries the head axis as a batch dim — no physical (3, B, H, N, d)
    transpose of the fused qkv tensor and no output transpose.  Exactly
    the same math on the same param tree (equivalence-tested,
    tests/test_models.py); the HAT ×4 device trace showed 57 ms/step of
    pure layout copies, and this removes the big ones: 222.9 → 179.1
    ms/step measured on hardware.  ``SRADSGAN_TPU_HAT_ATTN=ref`` restores
    the transposed formulation.
    """
    import os
    return os.environ.get("SRADSGAN_TPU_HAT_ATTN", "nt")


def _softmax_dtype(q_dtype):
    """Attention-softmax accumulation dtype (default f32, exact).

    ``SRADSGAN_TPU_HAT_SOFTMAX=bf16`` keeps the (B_, heads, N, N) logit
    chain in the compute dtype — a measured −15.6% step time on the ×4
    train step (179.1 → 151.1 ms, docs/PERF.md round-5 HAT campaign) —
    but the same-seed blessing twins on TWO seeds showed a systematic
    endpoint quality cost (−0.24 / −0.22 dB PSNR at 600 steps, ERGAS
    worse on both; docs/VALIDATION.md round 5), so by the repo's
    blessing criterion (the bf16-D standard: no systematic endpoint gap)
    it stays OPT-IN: a documented speed/quality trade-off, not the
    default.  The reference trains HAT with f32 softmax semantics
    (model/hat.py attention path).
    """
    import os
    if os.environ.get("SRADSGAN_TPU_HAT_SOFTMAX", "f32") == "bf16":
        return q_dtype
    return jnp.float32


# ---------------------------------------------------------------------------
# Static (numpy) index/mask precomputation — reference hat.py:763-822
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def rpi_sa(window: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[..., 0] += window - 1
    rel[..., 1] += window - 1
    rel[..., 0] *= 2 * window - 1
    return rel.sum(-1)  # (w*w, w*w)


@functools.lru_cache(maxsize=32)
def rpi_oca(window: int, overlap_ratio: float) -> np.ndarray:
    wo = window
    we = window + int(overlap_ratio * window)
    co = np.stack(np.meshgrid(np.arange(wo), np.arange(wo),
                              indexing="ij")).reshape(2, -1)
    ce = np.stack(np.meshgrid(np.arange(we), np.arange(we),
                              indexing="ij")).reshape(2, -1)
    rel = ce[:, None, :] - co[:, :, None]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[..., 0] += wo - we + 1
    rel[..., 1] += wo - we + 1
    rel[..., 0] *= wo + we - 1
    return rel.sum(-1)  # (wo*wo, we*we)


@functools.lru_cache(maxsize=64)
def sw_attn_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """(nW, w*w, w*w) additive mask of 0 / -100 for shifted windows."""
    img = np.zeros((h, w))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift),
               slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    m = img.reshape(h // window, window, w // window, window)
    m = m.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, win, win, C) (reference hat.py:139-143)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win, win, c)


def window_reverse(windows: jnp.ndarray, win: int, h: int,
                   w: int) -> jnp.ndarray:
    b = windows.shape[0] // (h * w // win // win)
    x = windows.reshape(b, h // win, w // win, win, win, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, -1)


# ---------------------------------------------------------------------------
# Modules
# ---------------------------------------------------------------------------

class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, kernel_init=trunc02, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.out, kernel_init=trunc02, dtype=self.dtype)(x)


class ChannelAttentionHAT(nn.Module):
    """HAT's CAB channel attention (hat.py:92-106)."""

    squeeze_factor: int = 30
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(max(c // self.squeeze_factor, 1), kernel_init=trunc02,
                     dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, kernel_init=trunc02, dtype=self.dtype)(s)
        return x * nn.sigmoid(s)[:, None, None, :]


class CAB(nn.Module):
    compress_ratio: int = 3
    squeeze_factor: int = 30
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = ConvBlock(c // self.compress_ratio, 3, dtype=self.dtype)(x)
        y = nn.gelu(y)
        y = ConvBlock(c, 3, dtype=self.dtype)(y)
        return ChannelAttentionHAT(self.squeeze_factor, dtype=self.dtype)(y)


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (hat.py:151-199)."""

    dim: int
    window: int
    num_heads: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray]):
        # x: (B_, N, C) with N = window*window
        b_, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(3 * c, kernel_init=trunc02, dtype=self.dtype)(x)

        table = self.param(
            "relative_position_bias_table", trunc02,
            ((2 * self.window - 1) ** 2, h), jnp.float32)
        idx = rpi_sa(self.window)  # static numpy indices
        bias = table[idx.reshape(-1)].reshape(n, n, h).transpose(2, 0, 1)

        sm_dtype = _softmax_dtype(qkv.dtype)
        if _attn_impl() == "nt":
            # transpose-free: slice the fused qkv, keep (B_, N, h, d)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q = q.reshape(b_, n, h, d)
            k = k.reshape(b_, n, h, d)
            v = v.reshape(b_, n, h, d)
            attn = jnp.einsum("bqhd,bkhd->bhqk", q * (d ** -0.5), k)
            attn = attn.astype(sm_dtype) + bias[None].astype(sm_dtype)
            if mask is not None:
                nw = mask.shape[0]
                attn = (attn.reshape(b_ // nw, nw, h, n, n)
                        + mask[None, :, None].astype(sm_dtype))
                attn = attn.reshape(b_, h, n, n)
            attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b_, n, c)
            return nn.Dense(c, kernel_init=trunc02, dtype=self.dtype)(out)

        qkv = qkv.reshape(b_, n, 3, h, d).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (d ** -0.5), k)
        attn = attn.astype(sm_dtype) + bias[None].astype(sm_dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = (attn.reshape(b_ // nw, nw, h, n, n)
                    + mask[None, :, None].astype(sm_dtype))
            attn = attn.reshape(b_, h, n, n)
        attn = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b_, n, c)
        return nn.Dense(c, kernel_init=trunc02, dtype=self.dtype)(out)


class HAB(nn.Module):
    """Hybrid attention block: (S)W-MSA + 0.01-scaled CAB + MLP
    (hat.py:201-293)."""

    dim: int
    num_heads: int
    window: int
    shift: int
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    mlp_ratio: float = 4.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) spatial form
        b, hgt, wdt, c = x.shape
        win = min(self.window, hgt, wdt)
        shift = self.shift if win == self.window else 0

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        conv_x = CAB(self.compress_ratio, self.squeeze_factor,
                     dtype=self.dtype)(xn)

        if shift > 0:
            shifted = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(sw_attn_mask(hgt, wdt, win, shift))
        else:
            shifted = xn
            mask = None
        windows = window_partition(shifted, win).reshape(-1, win * win, c)
        attn = WindowAttention(self.dim, win, self.num_heads,
                               dtype=self.dtype)(windows, mask)
        attn = window_reverse(attn.reshape(-1, win, win, c), win, hgt, wdt)
        if shift > 0:
            attn = jnp.roll(attn, (shift, shift), axis=(1, 2))

        x = shortcut + attn + conv_x * self.conv_scale
        x = x + Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        return x


class OCAB(nn.Module):
    """Overlapping cross-attention block (hat.py:326-411)."""

    dim: int
    num_heads: int
    window: int
    overlap_ratio: float = 0.5
    mlp_ratio: float = 2.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        b, hgt, wdt, c = x.shape
        win = min(self.window, hgt, wdt)
        owin = win + int(self.overlap_ratio * win)
        pad = (owin - win) // 2
        nh, nw = hgt // win, wdt // win
        heads = self.num_heads
        d = c // heads

        shortcut = x
        xn = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        qkv = nn.Dense(3 * c, kernel_init=trunc02, dtype=self.dtype)(xn)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # q: plain window partition
        qw = window_partition(q, win).reshape(-1, win * win, c)

        # k/v: overlapping windows via pad + static strided slice stack
        def overlap_windows(t):
            tp = jnp.pad(t, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
            rows = []
            for i in range(nh):
                cols = []
                for j in range(nw):
                    cols.append(tp[:, i * win:i * win + owin,
                                   j * win:j * win + owin, :])
                rows.append(jnp.stack(cols, axis=1))
            # (b, nh, nw, owin, owin, c) -> (b*nh*nw, owin*owin, c)
            w = jnp.stack(rows, axis=1)
            return w.reshape(-1, owin * owin, c)

        kw = overlap_windows(k)
        vw = overlap_windows(v)

        b_ = qw.shape[0]
        table = self.param(
            "relative_position_bias_table", trunc02,
            ((win + owin - 1) ** 2, heads), jnp.float32)
        idx = rpi_oca(win, self.overlap_ratio)
        bias = table[idx.reshape(-1)].reshape(win * win, owin * owin,
                                              heads).transpose(2, 0, 1)
        sm_dtype = _softmax_dtype(qw.dtype)

        if _attn_impl() == "nt":
            qh = qw.reshape(b_, win * win, heads, d)
            kh = kw.reshape(b_, owin * owin, heads, d)
            vh = vw.reshape(b_, owin * owin, heads, d)
            attn = jnp.einsum("bqhd,bkhd->bhqk", qh * (d ** -0.5), kh)
            attn = attn.astype(sm_dtype) + bias[None].astype(sm_dtype)
            attn = jax.nn.softmax(attn, axis=-1).astype(qh.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh)
            out = out.reshape(b_, win * win, c)
        else:
            qh = qw.reshape(b_, win * win, heads, d).transpose(0, 2, 1, 3)
            kh = kw.reshape(b_, owin * owin, heads, d).transpose(0, 2, 1, 3)
            vh = vw.reshape(b_, owin * owin, heads, d).transpose(0, 2, 1, 3)
            attn = jnp.einsum("bhqd,bhkd->bhqk", qh * (d ** -0.5), kh)
            attn = attn.astype(sm_dtype) + bias[None].astype(sm_dtype)
            attn = jax.nn.softmax(attn, axis=-1).astype(qh.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
            out = out.transpose(0, 2, 1, 3).reshape(b_, win * win, c)
        out = window_reverse(out.reshape(-1, win, win, c), win, hgt, wdt)
        out = nn.Dense(c, kernel_init=trunc02, dtype=self.dtype)(out)

        x = shortcut + out
        x = x + Mlp(int(c * self.mlp_ratio), c, dtype=self.dtype)(
            nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x))
        return x


class RHAG(nn.Module):
    """Residual hybrid attention group: depth HABs + OCAB + conv, +x
    (hat.py:413-536)."""

    dim: int
    depth: int
    num_heads: int
    window: int
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x):
        shortcut = x
        for i in range(self.depth):
            x = HAB(self.dim, self.num_heads, self.window,
                    shift=0 if i % 2 == 0 else self.window // 2,
                    compress_ratio=self.compress_ratio,
                    squeeze_factor=self.squeeze_factor,
                    conv_scale=self.conv_scale,
                    mlp_ratio=self.mlp_ratio, dtype=self.dtype)(x)
        x = OCAB(self.dim, self.num_heads, self.window, self.overlap_ratio,
                 dtype=self.dtype)(x)
        x = ConvBlock(self.dim, 3, dtype=self.dtype)(x)
        return x + shortcut


class HAT(nn.Module):
    scale: int = 4
    num_channels: int = 3
    embed_dim: int = 96
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6)
    window_size: int = 0        # 0 = auto: 9 for 2^n scales, 8 for 3^n
    overlap_ratio: float = 0.5
    mlp_ratio: float = 4.0
    compress_ratio: int = 3
    squeeze_factor: int = 30
    conv_scale: float = 0.01
    num_feat: int = 64
    dtype: Optional[Any] = None

    def _window(self) -> int:
        if self.window_size:
            return self.window_size
        return 9 if (self.scale & (self.scale - 1)) == 0 else 8

    @nn.compact
    def __call__(self, x, train: bool = False):
        win = self._window()
        b, h0, w0, c_in = x.shape
        # pad to a window multiple (reference check_image_size, hat.py:836)
        ph = (win - h0 % win) % win
        pw = (win - w0 % win) % win
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")

        mean = jnp.asarray([0.4488, 0.4371, 0.4040], x.dtype)
        x = x - mean

        feat = ConvBlock(self.embed_dim, 3, dtype=self.dtype)(x)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(feat)  # patch_norm on embed
        for depth, heads in zip(self.depths, self.num_heads):
            y = RHAG(self.embed_dim, depth, heads, win, self.overlap_ratio,
                     self.mlp_ratio, self.compress_ratio,
                     self.squeeze_factor, self.conv_scale,
                     dtype=self.dtype)(y)
        y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(y)
        y = ConvBlock(self.embed_dim, 3, dtype=self.dtype)(y)
        feat = feat + y

        feat = ConvBlock(self.num_feat, 3, activation="lrelu01",
                         dtype=self.dtype)(feat)
        feat = UpsampleHead(self.num_feat, self.scale, activation=None,
                            share_stages=True, dtype=self.dtype)(feat)
        out = ConvBlock(self.num_channels, 3, dtype=self.dtype)(feat)
        out = out + mean
        if ph or pw:
            out = out[:, :h0 * self.scale, :w0 * self.scale, :]
        return out
