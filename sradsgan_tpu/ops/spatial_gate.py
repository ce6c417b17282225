"""TPU-fast spatial attention gate (SLAM / CBAM SpatialAttention).

The reference computes ``sigmoid(conv7x7([mean_c(x); max_c(x)])) * x``
(model/sradsgan.py:129-151, base_networks.py:424) — a channel reduction
producing 1-2 stat planes, a 7x7 conv over them, and a gated multiply.
The flagship runs ~49 instances per train step (36 RABs + discriminator
CBAM), so this op's formulation moves the whole-step number.

The formulation is selected via ``SRADSGAN_TPU_SLAM_IMPL`` (read at trace
time); every Avg|Max variant routes through the custom-VJP op in
ops/pallas/slam.py so the backward is the hand-written single-pass jnp
(or Pallas) kernel.  Measured g_pixel fwd+bwd (flagship x4, batch 16,
host-fetch timing, scripts/timing_probe.py):

- ``conv`` (default, 53.0 ms with the saved-residual backward; 55.5 with
  the recomputing one): f32 channel stats, ``lax.conv`` over the 2-plane
  stack, custom backward.
- ``taps`` (65.8 ms): the same stats with the kxk conv as an unrolled
  shift-and-add stencil (98 unaligned lane-shifts lose to the conv
  emitter), custom backward.
- ``pallas`` (62.0 ms): the fused single-pass Pallas kernels
  (golden-tested on device incl. grad-of-grad) — the HBM-traffic win does
  not survive in-context, kept as a documented negative result.
- ``autodiff-taps`` / ``autodiff-transpose`` (74.0 ms either way): debug
  impls differentiated by plain autodiff; the backward is the expensive
  part, not the stats layout.

All formulations run the gate math in float32 regardless of x's dtype;
second-order AD (the WGAN-GP grad-of-grad through discriminator gates,
losses/gan.py) flows through a nested custom VJP in slam.py.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp


def _stat_planes(x32: jnp.ndarray, pool_mode: str,
                 transpose: bool = False) -> List[jnp.ndarray]:
    """Channel statistics as (B, H, W) float32 planes.

    Takes the ALREADY-upcast f32 tensor: reducing the minor (lane) axis in
    bf16 is measurably slower on TPU than upcasting first (g_pixel 73.7 vs
    57.1 ms, scripts/timing_probe.py) — packed 2-byte lanes make a worse
    reduction than f32 despite the larger reads."""
    feats = []
    if transpose:
        xt = jnp.transpose(x32, (0, 3, 1, 2))
        if "Avg" in pool_mode:
            feats.append(jnp.mean(xt, axis=1))
        if "Max" in pool_mode:
            feats.append(jnp.max(xt, axis=1))
    else:
        if "Avg" in pool_mode:
            feats.append(jnp.mean(x32, axis=-1))
        if "Max" in pool_mode:
            feats.append(jnp.max(x32, axis=-1))
    return list(feats)


def _taps(planes: List[jnp.ndarray], kernel: jnp.ndarray) -> jnp.ndarray:
    """kxk conv over stat planes as an unrolled shift-and-add stencil."""
    k = kernel.shape[0]
    pad = (k - 1) // 2
    b, h, w = planes[0].shape
    kf = kernel.astype(jnp.float32)
    padded = [jnp.pad(p, ((0, 0), (pad, pad), (pad, pad))) for p in planes]
    s = jnp.zeros((b, h, w), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            for ci, p in enumerate(padded):
                s = s + kf[dh, dw, ci, 0] * p[:, dh:dh + h, dw:dw + w]
    return s


def spatial_gate_apply(x: jnp.ndarray, kernel: jnp.ndarray,
                       pool_mode: str = "Avg|Max") -> jnp.ndarray:
    """sigmoid(conv_kxk(channel stats)) * x.

    x: (B, H, W, C); kernel: (k, k, n_stats, 1) HWIO as created by
    ``nn.Conv(1, (k, k), use_bias=False)``.
    """
    impl = os.environ.get("SRADSGAN_TPU_SLAM_IMPL", "conv")
    if pool_mode == "Avg|Max" and not impl.startswith("autodiff"):
        # taps / conv / pallas all route through the custom-VJP op so the
        # backward is the hand-written single-pass jnp (or Pallas) kernel —
        # letting autodiff differentiate the forward costs ~17 ms/step
        # across the flagship's 49 instances (74.0 vs 57.1 ms g_pixel).
        from sradsgan_tpu.ops.pallas.slam import fused_spatial_gate
        return fused_spatial_gate(x, kernel)
    # generic autodiff path: single-stat pool modes and the documented-slow
    # debug impls (autodiff-taps / autodiff-transpose)
    x32 = x.astype(jnp.float32)
    planes = _stat_planes(x32, pool_mode,
                          transpose=impl.endswith("transpose"))
    assert len(planes) == kernel.shape[2], (pool_mode, kernel.shape)
    s = _taps(planes, kernel)
    return (jax.nn.sigmoid(s)[..., None] * x32).astype(x.dtype)
