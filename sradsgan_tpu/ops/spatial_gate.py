"""TPU-fast spatial attention gate (SLAM / CBAM SpatialAttention).

The reference computes ``sigmoid(conv7x7([mean_c(x); max_c(x)])) * x``
(model/sradsgan.py:129-151, base_networks.py:424) — per instance that is a
channel (minor-axis) reduction producing a 1-channel map, a 7x7 conv with 2
input channels, and a gated multiply.  All three shapes are pathological for
the stock XLA lowering on TPU (cross-lane reduce, 1/128-lane conv, 1-lane
layouts): measured ~2.4 ms per instance at (16, 54, 54, 64) bf16, x49
instances per flagship step.

This implementation restructures the SAME math into TPU-friendly layouts:

1. one transpose to (B, C, H, W) so both channel statistics reduce over a
   non-minor axis (sequential accumulation, single HBM pass, (B, H, W)
   lane-friendly outputs);
2. the 7x7 conv as an unrolled 49-tap shift-and-add stencil over the two
   (B, H, W) stat planes in float32 (VPU-bound, fuses into one loop);
3. one broadcast multiply against x.

Numerics match the ``nn.Conv`` formulation to float tolerance (tap
accumulation in f32; tests/test_pallas_ops.py golden-checks it), and the
whole path is plain jnp, so it runs identically on CPU test meshes and
differentiates with standard autodiff.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spatial_gate_apply(x: jnp.ndarray, kernel: jnp.ndarray,
                       pool_mode: str = "Avg|Max") -> jnp.ndarray:
    """sigmoid(conv_kxk(channel stats)) * x.

    x: (B, H, W, C); kernel: (k, k, n_stats, 1) HWIO as created by
    ``nn.Conv(1, (k, k), use_bias=False)``.
    """
    b, h, w, c = x.shape
    k = kernel.shape[0]
    pad = (k - 1) // 2
    xt = jnp.transpose(x, (0, 3, 1, 2))
    feats = []
    if "Avg" in pool_mode:
        feats.append(jnp.mean(xt, axis=1))
    if "Max" in pool_mode:
        feats.append(jnp.max(xt, axis=1))
    assert len(feats) == kernel.shape[2], (pool_mode, kernel.shape)
    planes = [f.astype(jnp.float32) for f in feats]
    planes = [jnp.pad(p, ((0, 0), (pad, pad), (pad, pad))) for p in planes]
    kf = kernel.astype(jnp.float32)
    s = jnp.zeros((b, h, w), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            for ci, p in enumerate(planes):
                s = s + kf[dh, dw, ci, 0] * p[:, dh:dh + h, dw:dw + w]
    gate = jax.nn.sigmoid(s).astype(x.dtype)
    return x * gate[..., None]
