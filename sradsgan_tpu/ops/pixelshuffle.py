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


def subpixel_to_convt_kernel(w: jnp.ndarray, r: int) -> jnp.ndarray:
    """Reindex a sub-pixel conv kernel into its transposed-conv equivalent.

    ``pixel_shuffle(conv3x3(x, w), r)`` (torch channel order
    ``c*r^2 + dy*r + dx``) is mathematically identical to a stride-r
    transposed conv (``lhs_dilation=r``) with a (3r, 3r, Cin, C) kernel:
    out[r*h+dy] needs input taps x[h-1..h+1], which the dilated correlation
    hits at KH = r*t + (r-1-dy) with padding (2r-1, 1) — so the reindex is
    "fold (dy, dx) into the spatial kernel dims, reversed".  Every W'
    element is a W element (no structural zeros), so FLOP count at the
    emitter's mercy but traffic loses the (B, rH, rW, C) shuffle transpose.

    w: (k, k, Cin, C*r*r) HWIO as created by ``nn.Conv``.
    """
    kh, kw, cin, crr = w.shape
    c = crr // (r * r)
    w6 = w.reshape(kh, kw, cin, c, r, r)       # [t, s, i, c, dy, dx]
    w6 = w6[..., ::-1, ::-1]                   # dy, dx reversed
    w6 = w6.transpose(0, 4, 1, 5, 2, 3)        # t, dy', s, dx', i, c
    return w6.reshape(kh * r, kw * r, cin, c)


def subpixel_conv_transposed(x: jnp.ndarray, w: jnp.ndarray,
                             b: jnp.ndarray, r: int) -> jnp.ndarray:
    """``pixel_shuffle(conv3x3(x, w) + b, r)`` as ONE transposed conv.

    Round-4 trace motivation: the shuffle's (B, H, r, W, r, C) transposes
    are ~2.4 ms/step of bandwidth-bound copies at the x4 tail
    (scripts/trace_step.py; docs/PERF.md).  The conv bias becomes an
    (r, r)-periodic spatial pattern after shuffling, added via a tiled
    plane that XLA fuses into the activation.
    """
    import jax

    rr1 = 2 * r - 1
    wt = subpixel_to_convt_kernel(w, r)
    out = jax.lax.conv_general_dilated(
        x, wt.astype(x.dtype), window_strides=(1, 1),
        padding=((rr1, rr1), (rr1, rr1)), lhs_dilation=(r, r),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        c = b.shape[0] // (r * r)
        pat = b.reshape(c, r, r).transpose(1, 2, 0)        # (dy, dx, C)
        plane = jnp.tile(pat, (x.shape[1], x.shape[2], 1))  # (rH, rW, C)
        out = out + plane[None].astype(out.dtype)
    return out


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """(B, H*r, W*r, C) -> (B, H, W, C*r*r), inverse of :func:`pixel_shuffle`."""
    b, hr, wr, c = x.shape
    r = factor
    h, w = hr // r, wr // r
    x = x.reshape(b, h, r, w, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, ry, rx
    return x.reshape(b, h, w, c * r * r)
