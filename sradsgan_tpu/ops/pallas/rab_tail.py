"""Pallas TPU megakernel: the fused RAB tail (CLAM + SLAM + 1x1 fuse).

The flagship's RAB ends with CLAM channel attention, SLAM spatial
attention, a 1x1 fuse conv and the residual add (reference
model/sradsgan.py:215-275); the zoo runs 48 such tails per train step
(36 RABs + 12 group-level LocalAttentions).  Round 2 established that a
Pallas kernel fusing ONLY the SLAM gate loses to XLA's in-context fusion
(docs/PERF.md) — the custom-call boundary starves XLA of fusion partners.
This kernel moves the boundary outward: one pass per batch element
computes

    u  = t * sigmoid(mlp(avg_hw(t)) + mlp(max_hw(t)))      # CLAM
    w  = u * sigmoid(conv7x7([mean_c(u); max_c(u)]))        # SLAM
    out = w @ W_fuse + b_fuse + x_res                       # fuse+residual

entirely in VMEM: reads t and x_res once, writes out once, and emits the
tiny byproducts (channel gate, spatial gate, stat planes, pooled vectors)
that the hand-written jnp backward consumes without recomputing the
forward reductions.

First-order only: the op is used in GENERATORS (LocalAttention CA-SA);
discriminators call ChannelGate/SpatialGate directly, so the WGAN-GP
grad-of-grad never differentiates this kernel.  Non-TPU backends run an
equivalent jnp formulation (identical math, golden-tested).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from sradsgan_tpu.ops.pallas.slam import (_is_tpu_backend, _plane_grads,
                                          _dw_contraction)

_VMEM_LIMIT_BYTES = 24 * 1024 * 1024


# ---------------------------------------------------------------------------
# jnp reference (fallback + residual source)
# ---------------------------------------------------------------------------

def _mlp(v32, w1, w2):
    return jnp.maximum(v32 @ w1, 0.0) @ w2


def _forward_jnp(t, x_res, w1, w2, slam_w, fuse_w, fuse_b):
    """Returns (out, gate_c, gate_s, mean_u, max_u, avg_t, max_t)."""
    t32 = t.astype(jnp.float32)
    avg_t = jnp.mean(t32, axis=(1, 2))                      # (B, C)
    max_t = jnp.max(t32, axis=(1, 2))
    gate_c = jax.nn.sigmoid(_mlp(avg_t, w1, w2) + _mlp(max_t, w1, w2))
    u = t32 * gate_c[:, None, None, :]
    mean_u = jnp.mean(u, axis=-1)                           # (B, H, W)
    max_u = jnp.max(u, axis=-1)
    stack = jnp.stack([mean_u, max_u], axis=-1)
    s = jax.lax.conv_general_dilated(
        stack, slam_w.astype(jnp.float32), window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    gate_s = jax.nn.sigmoid(s)
    w_ = u * gate_s[..., None]
    out = (w_ @ fuse_w + fuse_b).astype(t.dtype) + x_res
    return out, gate_c, gate_s, mean_u, max_u, avg_t, max_t


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------

def _fwd_kernel(k: int, h: int, w: int, t_ref, x_ref, w1_ref, w2_ref,
                slam_ref, fusew_ref, fuseb_ref, out_ref, gc_ref, gs_ref,
                mu_ref, xu_ref, at_ref, mt_ref, mean_s, max_s):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    pad = (k - 1) // 2
    t32 = t_ref[0].astype(jnp.float32)                      # (H, W, C)
    c = t32.shape[-1]

    # ---- CLAM: global pools + shared MLP + sigmoid scale ----
    # both pooled vectors ride ONE (2, C) x (C, hidden) matmul (Mosaic
    # rejects 1-D vector matmuls)
    avg_t = jnp.mean(t32, axis=(0, 1))                      # (C,)
    max_t = jnp.max(t32, axis=(0, 1))
    pools = jnp.stack([avg_t, max_t])                       # (2, C)
    hcat = jnp.maximum(jnp.dot(pools, w1_ref[...],
                               preferred_element_type=jnp.float32), 0.0)
    z = jnp.dot(hcat, w2_ref[...],
                preferred_element_type=jnp.float32)         # (2, C)
    gate_c = jax.nn.sigmoid(z[0] + z[1])                    # (C,)
    u = t32 * gate_c[None, None, :]

    # ---- SLAM: channel stats + k*k stencil + sigmoid scale ----
    mean_u = jnp.mean(u, axis=-1)                           # (H, W)
    max_u = jnp.max(u, axis=-1)
    mean_s[:] = jnp.zeros(mean_s.shape, jnp.float32)
    max_s[:] = jnp.zeros(max_s.shape, jnp.float32)
    mean_s[pad:pad + h, pad:pad + w] = mean_u
    max_s[pad:pad + h, pad:pad + w] = max_u
    s = jnp.zeros((h, w), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            s = s + (slam_ref[dh, dw, 0] * mean_s[dh:dh + h, dw:dw + w]
                     + slam_ref[dh, dw, 1] * max_s[dh:dh + h, dw:dw + w])
    gate_s = jax.nn.sigmoid(s)
    w_ = u * gate_s[..., None]

    # ---- 1x1 fuse conv (MXU) + residual ----
    # bf16 operands + f32 accumulate: the XLA formulation this replaces
    # runs its f32 conv at DEFAULT precision, which rounds operands to
    # bf16 for the single-pass MXU anyway
    y = jnp.dot(w_.reshape(h * w, c).astype(jnp.bfloat16),
                fusew_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    y = y + fuseb_ref[...][None, :]
    out = y.reshape(h, w, c) + x_ref[0].astype(jnp.float32)

    out_ref[0] = out.astype(out_ref.dtype)
    gs_ref[0] = gate_s
    mu_ref[0] = mean_u
    xu_ref[0] = max_u
    # (B, C) vector byproducts use whole-array blocks (Mosaic rejects
    # (1, C) blocks when C < 128); each grid step writes its own row.
    gc_ref[i] = gate_c
    at_ref[i] = avg_t
    mt_ref[i] = max_t


def _fwd_pallas(t, x_res, w1, w2, slam_w, fuse_w, fuse_b):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = t.shape
    k = slam_w.shape[0]
    pad = (k - 1) // 2
    kernel = functools.partial(_fwd_kernel, k, h, w)
    plane = jax.ShapeDtypeStruct((b, h, w), jnp.float32)
    vec = jax.ShapeDtypeStruct((b, c), jnp.float32)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    per_b = lambda nd: pl.BlockSpec((1,) + nd, lambda i: (i,) + (0,) * len(nd),
                                    memory_space=pltpu.VMEM)
    whole_vec = lambda: pl.BlockSpec((b, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[per_b((h, w, c)), per_b((h, w, c)), full(), full(),
                  full(), full(), full()],
        out_specs=(per_b((h, w, c)), whole_vec(), per_b((h, w)),
                   per_b((h, w)), per_b((h, w)), whole_vec(), whole_vec()),
        out_shape=(jax.ShapeDtypeStruct(t.shape, t.dtype), vec, plane,
                   plane, plane, vec, vec),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * pad, w + 2 * pad), jnp.float32),
            pltpu.VMEM((h + 2 * pad, w + 2 * pad), jnp.float32),
        ],
    )(t, x_res, w1.astype(jnp.float32), w2.astype(jnp.float32),
      slam_w.astype(jnp.float32), fuse_w.astype(jnp.float32),
      fuse_b.astype(jnp.float32))
    return outs


def _pallas_ok(t) -> bool:
    b, h, w, c = t.shape
    bytes_needed = h * w * max(c, 128) * 4 * 4  # t, x, w_, out slices
    # Single-device only (plan DIRECT): unlike the slam/pooling kernels
    # this one's byproducts reduce ACROSS the batch grid (dfuse_w/b vecs),
    # so a batch shard_map would need psums — not worth building for a
    # kernel kept as a documented negative result (docs/PERF.md).
    from sradsgan_tpu.ops.spmd import DIRECT, plan_batch_kernel
    return (_is_tpu_backend() and h >= 8 and w >= 8
            and bytes_needed < _VMEM_LIMIT_BYTES
            and plan_batch_kernel(b) is DIRECT)


# ---------------------------------------------------------------------------
# Hand-written backward (jnp; consumes the forward's byproducts)
# ---------------------------------------------------------------------------

def _bwd_jnp(res, g) -> Tuple[jnp.ndarray, ...]:
    (t, x_res, w1, w2, slam_w, fuse_w, fuse_b,
     gate_c, gate_s, mean_u, max_u, avg_t, max_t) = res
    b, h, wdt, c = t.shape
    k = slam_w.shape[0]
    pad = (k - 1) // 2
    hw = h * wdt

    t32 = t.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    fwf = fuse_w.astype(jnp.float32)

    u = t32 * gate_c[:, None, None, :]

    # fuse conv backward
    dx_res = g
    dw_flat = g32.reshape(b * hw, c)
    w_flat = (u * gate_s[..., None]).reshape(b * hw, c)
    dfuse_w = w_flat.T @ dw_flat
    dfuse_b = jnp.sum(dw_flat, axis=0)
    dwgated = (dw_flat @ fwf.T).reshape(b, h, wdt, c)       # d(u*gate_s)

    # SLAM backward (saved gate/stat planes; ties recomputed from u)
    dgate_s = jnp.sum(dwgated * u, axis=-1)
    ds = dgate_s * gate_s * (1.0 - gate_s)
    dmean_u, dmax_u = _plane_grads(ds, slam_w.astype(jnp.float32))
    is_max_u = (u == max_u[..., None]).astype(jnp.float32)
    ties_u = jnp.maximum(jnp.sum(is_max_u, axis=-1), 1.0)
    du = (dwgated * gate_s[..., None]
          + dmean_u[..., None] / c
          + (dmax_u / ties_u)[..., None] * is_max_u)
    dslam_w = _dw_contraction(ds, mean_u, max_u, k, pad, h, wdt,
                              jnp.float32)

    # CLAM backward
    dgate_c = jnp.sum(du * t32, axis=(1, 2))                # (B, C)
    dt = du * gate_c[:, None, None, :]
    dz = dgate_c * gate_c * (1.0 - gate_c)                  # pre-sigmoid
    # z = mlp(avg) + mlp(max); shared MLP
    h_avg = jnp.maximum(avg_t @ w1f, 0.0)                   # (B, hidden)
    h_max = jnp.maximum(max_t @ w1f, 0.0)
    dw2 = h_avg.T @ dz + h_max.T @ dz
    dh_avg = (dz @ w2f.T) * (h_avg > 0)
    dh_max = (dz @ w2f.T) * (h_max > 0)
    dw1 = avg_t.T @ dh_avg + max_t.T @ dh_max
    davg = dh_avg @ w1f.T                                   # (B, C)
    dmaxt = dh_max @ w1f.T
    is_max_t = (t32 == max_t[:, None, None, :]).astype(jnp.float32)
    ties_t = jnp.maximum(jnp.sum(is_max_t, axis=(1, 2)), 1.0)
    dt = (dt + davg[:, None, None, :] / hw
          + (dmaxt / ties_t)[:, None, None, :] * is_max_t)

    return (dt.astype(t.dtype), dx_res,
            dw1.astype(w1.dtype), dw2.astype(w2.dtype),
            dslam_w.astype(slam_w.dtype),
            dfuse_w.astype(fuse_w.dtype), dfuse_b.astype(fuse_b.dtype))


# ---------------------------------------------------------------------------
# custom-VJP op
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_rab_tail(t, x_res, w1, w2, slam_w, fuse_w, fuse_b):
    """out = (CLAM -> SLAM -> 1x1 fuse)(t) + x_res.

    t, x_res: (B, H, W, C); w1: (C, hidden); w2: (hidden, C);
    slam_w: (k, k, 2, 1) HWIO; fuse_w: (C, C); fuse_b: (C,).
    """
    if _pallas_ok(t):
        return _fwd_pallas(t, x_res, w1, w2, slam_w[..., 0], fuse_w,
                           fuse_b)[0]
    return _forward_jnp(t, x_res, w1, w2, slam_w, fuse_w, fuse_b)[0]


def _vjp_fwd(t, x_res, w1, w2, slam_w, fuse_w, fuse_b):
    if _pallas_ok(t):
        out, gate_c, gate_s, mean_u, max_u, avg_t, max_t = _fwd_pallas(
            t, x_res, w1, w2, slam_w[..., 0], fuse_w, fuse_b)
    else:
        out, gate_c, gate_s, mean_u, max_u, avg_t, max_t = _forward_jnp(
            t, x_res, w1, w2, slam_w, fuse_w, fuse_b)
    return out, (t, x_res, w1, w2, slam_w, fuse_w, fuse_b,
                 gate_c, gate_s, mean_u, max_u, avg_t, max_t)


def _vjp_bwd(res, g):
    return _bwd_jnp(res, g)


fused_rab_tail.defvjp(_vjp_fwd, _vjp_bwd)
