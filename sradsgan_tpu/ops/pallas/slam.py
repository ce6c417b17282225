"""Pallas TPU kernel: fused SLAM / CBAM spatial-attention gate.

The zoo's spatial gates compute ``sigmoid(conv_kxk([mean_c(x); max_c(x)]))
* x`` (reference model/sradsgan.py:129-151, base_networks.py:424).  The
stock XLA lowering is pathological on TPU — a minor-axis (cross-lane)
channel reduce into a 1-lane map, a k*k conv with 2 input channels padded
to 128 lanes, and a broadcast multiply, each a separate HBM pass.  The
flagship runs 49 of these per step.

This kernel fuses the whole gate into ONE pass over x per direction:

- forward: per batch element, read the (H, W, C) slice once, reduce both
  channel stats in VMEM, run the k*k conv as an unrolled shift-and-add
  stencil over zero-padded (H+2p, W+2p) scratch planes (f32, VPU), apply
  sigmoid and the gated multiply, write out.
- backward: one pass reading (x, dout) and writing dx; the stat planes are
  recomputed in VMEM (max ties are recomputed and count-guarded — never
  masked against a saved forward max, see bf16 lesson in pooling.py).  The
  tiny conv-weight gradient is returned via byproducts (ds and the pooled
  planes) and contracted outside the kernel by XLA.

Semantics note: all gate math runs in float32 regardless of x's dtype
(matches the reference's f32 torch conv more closely than the bf16 XLA
path it replaces).  Non-TPU backends fall back to an equivalent jnp
formulation so CPU tests exercise identical semantics.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_TPU_PLATFORMS = ("tpu", "axon")
_VMEM_LIMIT_BYTES = 24 * 1024 * 1024  # per-slice guard; fall back beyond


def _is_tpu_backend() -> bool:
    from sradsgan_tpu.ops.spmd import pallas_interpret
    try:
        return (jax.default_backend() in _TPU_PLATFORMS
                or pallas_interpret())
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Reference (jnp) path — also the non-TPU fallback and the dw contraction
# ---------------------------------------------------------------------------

def _pools(x32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.mean(x32, axis=-1), jnp.max(x32, axis=-1)


def _stats_variadic() -> bool:
    import os
    return os.environ.get("SRADSGAN_TPU_SLAM_STATS", "") == "variadic"


def _pools_fast(x32: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """mean_c / max_c as ONE variadic lane reduce (opt-in,
    SRADSGAN_TPU_SLAM_STATS=variadic).

    Round-4 trace finding (scripts/trace_step.py): the default two-reduce
    formulation shows up as ~179 `convert_reduce_fusion` ops = 7.8 ms/step
    across the flagship's 48 gates — each lane-axis reduce pays the full
    cross-lane pass over the (B, H, W, 64) slice.  A single variadic
    ``lax.reduce`` halves the stat passes.  Only used inside custom-VJP
    bodies that are never autodiff'd (variadic reduce has no JVP rule).
    """
    c = x32.shape[-1]
    s, m = jax.lax.reduce(
        (x32, x32), (jnp.float32(0), jnp.float32(-jnp.inf)),
        lambda a, b: (a[0] + b[0], jnp.maximum(a[1], b[1])), (3,))
    return s / c, m


def _pools_sel(x32):
    return _pools_fast(x32) if _stats_variadic() else _pools(x32)


def _conv_taps(planes, w32):
    """planes: list of (B, H, W) f32; w32: (k, k, n, 1) -> (B, H, W)."""
    k = w32.shape[0]
    pad = (k - 1) // 2
    b, h, wdt = planes[0].shape
    padded = [jnp.pad(p, ((0, 0), (pad, pad), (pad, pad))) for p in planes]
    s = jnp.zeros((b, h, wdt), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            for ci, p in enumerate(padded):
                s = s + w32[dh, dw, ci, 0] * p[:, dh:dh + h, dw:dw + wdt]
    return s


def _gate_reference(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean, mx = _pools(x32)
    s = _conv_taps([mean, mx], w.astype(jnp.float32))
    return (jax.nn.sigmoid(s)[..., None] * x32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------

def _fwd_kernel(k: int, h: int, w: int, x_ref, w_ref, out_ref,
                mean_s, max_s):
    pad = (k - 1) // 2
    x32 = x_ref[0].astype(jnp.float32)                    # (H, W, C)
    mean_s[:] = jnp.zeros(mean_s.shape, jnp.float32)
    max_s[:] = jnp.zeros(max_s.shape, jnp.float32)
    mean_s[pad:pad + h, pad:pad + w] = jnp.mean(x32, axis=-1)
    max_s[pad:pad + h, pad:pad + w] = jnp.max(x32, axis=-1)
    s = jnp.zeros((h, w), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            s = s + (w_ref[dh, dw, 0] * mean_s[dh:dh + h, dw:dw + w]
                     + w_ref[dh, dw, 1] * max_s[dh:dh + h, dw:dw + w])
    gate = jax.nn.sigmoid(s)
    out_ref[0] = (x32 * gate[..., None]).astype(out_ref.dtype)


def _fwd_pallas(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wdt, c = x.shape
    k = w.shape[0]
    pad = (k - 1) // 2
    w2 = w[..., 0].astype(jnp.float32)                    # (k, k, 2)
    kernel = functools.partial(_fwd_kernel, k, h, wdt)
    from sradsgan_tpu.ops.spmd import pallas_interpret
    return pl.pallas_call(
        kernel,
        interpret=pallas_interpret(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * pad, wdt + 2 * pad), jnp.float32),
            pltpu.VMEM((h + 2 * pad, wdt + 2 * pad), jnp.float32),
        ],
    )(x, w2)


# ---------------------------------------------------------------------------
# Pallas backward: dx in one fused pass; byproducts (ds, mean, max) for dw
# ---------------------------------------------------------------------------

def _bwd_kernel(k: int, h: int, w: int, x_ref, g_ref, w_ref,
                dx_ref, ds_ref, mean_ref, max_ref, mean_s, max_s, ds_s):
    pad = (k - 1) // 2
    x32 = x_ref[0].astype(jnp.float32)
    g32 = g_ref[0].astype(jnp.float32)
    c = x32.shape[-1]

    mean_s[:] = jnp.zeros(mean_s.shape, jnp.float32)
    max_s[:] = jnp.zeros(max_s.shape, jnp.float32)
    mean = jnp.mean(x32, axis=-1)
    mx = jnp.max(x32, axis=-1)
    mean_s[pad:pad + h, pad:pad + w] = mean
    max_s[pad:pad + h, pad:pad + w] = mx

    s = jnp.zeros((h, w), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            s = s + (w_ref[dh, dw, 0] * mean_s[dh:dh + h, dw:dw + w]
                     + w_ref[dh, dw, 1] * max_s[dh:dh + h, dw:dw + w])
    gate = jax.nn.sigmoid(s)

    dgate = jnp.sum(g32 * x32, axis=-1)                  # (H, W)
    ds = dgate * gate * (1.0 - gate)
    ds_s[:] = jnp.zeros(ds_s.shape, jnp.float32)
    ds_s[pad:pad + h, pad:pad + w] = ds

    # transposed conv: dplane[h,w] = sum_taps w[dh,dw] * ds[h-dh+pad, ...]
    dmean = jnp.zeros((h, w), jnp.float32)
    dmax = jnp.zeros((h, w), jnp.float32)
    for dh in range(k):
        for dw in range(k):
            shifted = ds_s[2 * pad - dh:2 * pad - dh + h,
                           2 * pad - dw:2 * pad - dw + w]
            dmean = dmean + w_ref[dh, dw, 0] * shifted
            dmax = dmax + w_ref[dh, dw, 1] * shifted

    is_max = (x32 == mx[..., None]).astype(jnp.float32)
    ties = jnp.maximum(jnp.sum(is_max, axis=-1), 1.0)
    dx = (g32 * gate[..., None]
          + dmean[..., None] / c
          + (dmax / ties)[..., None] * is_max)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    ds_ref[0] = ds
    mean_ref[0] = mean
    max_ref[0] = mx


def _bwd_pallas(x: jnp.ndarray, g: jnp.ndarray, w: jnp.ndarray):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, wdt, c = x.shape
    k = w.shape[0]
    pad = (k - 1) // 2
    w2 = w[..., 0].astype(jnp.float32)
    kernel = functools.partial(_bwd_kernel, k, h, wdt)
    plane = jax.ShapeDtypeStruct((b, h, wdt), jnp.float32)
    from sradsgan_tpu.ops.spmd import pallas_interpret
    return pl.pallas_call(
        kernel,
        interpret=pallas_interpret(),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, h, wdt, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wdt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wdt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, wdt), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype), plane, plane,
                   plane),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * pad, wdt + 2 * pad), jnp.float32),
            pltpu.VMEM((h + 2 * pad, wdt + 2 * pad), jnp.float32),
            pltpu.VMEM((h + 2 * pad, wdt + 2 * pad), jnp.float32),
        ],
    )(x, g, w2)


@jax.custom_jvp
def _fwd_pallas_jvpsafe(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Pallas forward with a JVP rule riding the jnp reference.

    Second-order AD (the WGAN-GP grad-of-grad) JVP-traces the custom-vjp
    forward; this environment's jax asserts inside pallas_call's built-in
    JVP rule (a regression — round 2 verified grad-of-grad through the
    raw kernel), so the tangent is computed from the mathematically
    identical ``_gate_reference`` while the primal stays the fused kernel.
    """
    return _fwd_pallas_spmd(x, w)


@_fwd_pallas_jvpsafe.defjvp
def _fwd_pallas_jvp(primals, tangents):
    out = _fwd_pallas_spmd(*primals)
    _, tangent = jax.jvp(_gate_reference, primals, tangents)
    return out, tangent


def _impl() -> str:
    import os
    return os.environ.get("SRADSGAN_TPU_SLAM_IMPL", "conv")


def _pallas_ok(x: jnp.ndarray) -> bool:
    # The Pallas kernels are opt-in (SRADSGAN_TPU_SLAM_IMPL=pallas):
    # measured 62.0 ms g_pixel vs 57.1 for the jnp taps forward + the
    # hand-written jnp backward below (scripts/timing_probe.py).
    if _impl() != "pallas":
        return False
    b, h, w, c = x.shape
    bytes_per_slice = h * w * max(c, 128) * 4
    if not (_is_tpu_backend() and h >= 8 and w >= 8
            and bytes_per_slice < _VMEM_LIMIT_BYTES):
        return False
    from sradsgan_tpu.ops.spmd import plan_batch_kernel
    return plan_batch_kernel(b) is not None


def _fwd_pallas_spmd(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """_fwd_pallas, shard_mapped over the data mesh when multi-device."""
    from sradsgan_tpu.ops.spmd import (DIRECT, plan_batch_kernel,
                                       shard_map_batch)
    plan = plan_batch_kernel(x.shape[0])
    if plan is DIRECT:
        return _fwd_pallas(x, w)
    return shard_map_batch(_fwd_pallas, plan, 1, n_rep_in=1)(x, w)


def _bwd_pallas_spmd(x: jnp.ndarray, g: jnp.ndarray, w: jnp.ndarray):
    from sradsgan_tpu.ops.spmd import (DIRECT, plan_batch_kernel,
                                       shard_map_batch)
    plan = plan_batch_kernel(x.shape[0])
    if plan is DIRECT:
        return _bwd_pallas(x, g, w)
    return shard_map_batch(_bwd_pallas, plan, 2, n_rep_in=1,
                           out_batched=(True, True, True, True))(x, g, w)


def _min_per_device_batch(b: int) -> int:
    """Worst-case per-device batch for a trace-time global batch ``b``.

    Under pjit the trace sees the GLOBAL batch while each device executes
    its shard; the small-batch miscompile guarded in ``_stat_conv`` /
    ``_plane_grads`` triggers on the EXECUTED per-device shape.  The
    trainer's 1-D data mesh shards the batch over every addressable
    device, so the guard assumes that worst case: global batch divided by
    ``jax.device_count()`` (equal to the global batch on a single chip,
    where the raw conv is proven clean and measurably faster).
    """
    try:
        n = jax.device_count()
    except Exception:
        n = 1
    return max(b // max(n, 1), 1)


def _stat_conv(stack: jnp.ndarray, w32: jnp.ndarray) -> jnp.ndarray:
    """k×k conv over the (B, H, W, 2) stat stack -> (B, H, W) score plane,
    with the 2 input lanes EXPLICITLY zero-padded to 8.

    The raw 2-lane conv miscompiles on this TPU backend when fused into the
    full generator graph at small batch: batch 2 and 4 return all-NaN while
    1/8/16 are clean, the same graph with taps or in f32 is clean, and the
    conv standalone is clean (round-3 bisection, docs/VALIDATION.md
    "Found-and-fixed: small-batch stat-conv miscompile") — consistent with
    the emitter reading uninitialized lane padding for sub-tile shapes.
    Padding the lanes to a full 8-sublane group with explicit zeros (and
    zero kernel rows, so the math is unchanged) sidesteps the bad lowering.
    The guard is batch-conditional at trace time: unconditional padding
    measured 7.06 vs 7.31 MP/s on the full train step (batch 16), while
    batch >= 8 is proven clean with the raw conv — so the raw formulation
    stays when every device's shard is >= 8 and the padded one covers the
    small-batch eval/serving shapes AND per-device-sharded training (the
    trace-time shape is the GLOBAL batch; a multi-chip mesh executes the
    conv at global/n_devices — see ``_min_per_device_batch``)."""
    if _min_per_device_batch(stack.shape[0]) >= 8:
        return jax.lax.conv_general_dilated(
            stack, w32, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]
    stack8 = jnp.pad(stack, ((0, 0), (0, 0), (0, 0), (0, 6)))
    w8 = jnp.pad(w32, ((0, 0), (0, 0), (0, 6), (0, 0)))
    return jax.lax.conv_general_dilated(
        stack8, w8, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[..., 0]


def _gate_conv_reference(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Forward via lax.conv over the stacked stat planes (NHWC)."""
    x32 = x.astype(jnp.float32)
    mean, mx = _pools(x32)
    stack = jnp.stack([mean, mx], axis=-1)
    s = _stat_conv(stack, w.astype(jnp.float32))
    return (jax.nn.sigmoid(s)[..., None] * x32).astype(x.dtype)


# ---------------------------------------------------------------------------
# Backward math (pure jnp) — also the source of truth for second-order AD
# ---------------------------------------------------------------------------

def _plane_grads(ds, w32):
    """(dmean, dmax) via ONE transposed conv on the ds plane.

    The stat-plane gradient is conv(ds, rot180(w_i)) per plane; lowering it
    as a single 1->2-channel ``lax.conv`` beats the unrolled 2*k*k
    shift-and-add stencil for the same reason the forward's conv
    formulation beat taps (docs/PERF.md shootout): the conv emitter's
    plane passes are fused, the 98 unaligned lane-shifts are not.
    ds: (B, H, W) f32; w32: (k, k, 2, 1) f32.
    """
    kern = jnp.flip(w32[:, :, :, 0], axis=(0, 1))[:, :, None, :]  # (k,k,1,2)
    if _min_per_device_batch(ds.shape[0]) >= 8:
        out = jax.lax.conv_general_dilated(
            ds[..., None], kern, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out[..., 0], out[..., 1]
    # Small batch: lanes padded 1->8 in / 2->8 out with explicit zeros —
    # the sub-tile-lane conv miscompiles at batch 2-4 on this backend (see
    # _stat_conv).  A real multi-chip mesh puts per-device batch at 2-4,
    # so the sharded training backward needs the guard as much as the
    # eval forward.
    kern8 = jnp.pad(kern, ((0, 0), (0, 0), (0, 7), (0, 6)))
    ds8 = jnp.pad(ds[..., None], ((0, 0), (0, 0), (0, 0), (0, 7)))
    out = jax.lax.conv_general_dilated(
        ds8, kern8, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out[..., 0], out[..., 1]


def _dw_contraction(ds, mean, mx, k, pad, h, wdt, wdtype):
    """dw: tiny contraction over the pooled planes (XLA)."""
    planes = jnp.stack([mean, mx], axis=-1)               # (B, H, W, 2)
    pp = jnp.pad(planes, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    rows = []
    for dh in range(k):
        cols = []
        for dw in range(k):
            patch = pp[:, dh:dh + h, dw:dw + wdt, :]      # (B, H, W, 2)
            cols.append(jnp.einsum("bhw,bhwc->c", ds, patch))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)[..., None].astype(wdtype)      # (k, k, 2, 1)


def _bwd_jnp(x, w, g):
    """(dx, dw) of the gate in plain jnp (autodiff-able for 2nd order)."""
    k = w.shape[0]
    pad = (k - 1) // 2
    h, wdt = x.shape[1], x.shape[2]
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    c = x.shape[-1]
    mean, mx = _pools(x32)
    s = _conv_taps([mean, mx], w.astype(jnp.float32))
    gate = jax.nn.sigmoid(s)
    dgate = jnp.sum(g32 * x32, axis=-1)
    ds = dgate * gate * (1.0 - gate)
    dmean, dmax = _plane_grads(ds, w.astype(jnp.float32))
    is_max = (x32 == mx[..., None]).astype(jnp.float32)
    ties = jnp.maximum(jnp.sum(is_max, axis=-1), 1.0)
    dx = (g32 * gate[..., None] + dmean[..., None] / c
          + (dmax / ties)[..., None] * is_max).astype(x.dtype)
    return dx, _dw_contraction(ds, mean, mx, k, pad, h, wdt, w.dtype)


# The backward is ITSELF a custom-vjp op: first-order uses the fused Pallas
# kernel; second-order (the WGAN-GP grad-of-grad through discriminators
# that contain spatial gates, losses/gan.py) differentiates the equivalent
# jnp backward with standard autodiff — Pallas kernels have no AD rules.
@jax.custom_vjp
def _gate_bwd(x, w, g):
    if _pallas_ok(x):
        dx, ds, mean, mx = _bwd_pallas_spmd(x, g, w)
        k = w.shape[0]
        pad = (k - 1) // 2
        dw_ = _dw_contraction(ds, mean, mx, k, pad, x.shape[1], x.shape[2],
                              w.dtype)
        return dx, dw_
    return _bwd_jnp(x, w, g)


def _gate_bwd_fwd(x, w, g):
    return _gate_bwd(x, w, g), (x, w, g)


def _gate_bwd_bwd(res, cotangents):
    x, w, g = res
    _, vjp = jax.vjp(_bwd_jnp, x, w, g)
    return vjp(cotangents)


_gate_bwd.defvjp(_gate_bwd_fwd, _gate_bwd_bwd)


# Saved-residual first-order backward: the forward stashes the (tiny) stat
# planes and gate — 3 x (B, H, W) f32 — so dx/dw skip the channel-reduce
# and conv recompute (measured: SLAM backward dominates the gate's 17 ms
# share of g_pixel).  Second-order AD (the GP grad-of-grad) still flows
# through the full RECOMPUTING ``_bwd_jnp`` via this op's own custom VJP,
# which also returns zero cotangents for the saved-plane slots: the true
# x/w dependence of the stats is already captured by differentiating the
# recomputing formula, and custom_vjp residuals are constants to outer AD.
@jax.custom_vjp
def _gate_bwd_saved(x, w, g, gate, mean, mx):
    k = w.shape[0]
    pad = (k - 1) // 2
    h, wdt = x.shape[1], x.shape[2]
    c = x.shape[-1]
    x32 = x.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    is_max = (x32 == mx[..., None]).astype(jnp.float32)
    if _stats_variadic():
        # ONE variadic lane reduce for (dgate, tie-count) — see _pools_fast
        dgate, nties = jax.lax.reduce(
            (g32 * x32, is_max), (jnp.float32(0), jnp.float32(0)),
            lambda a, b: (a[0] + b[0], a[1] + b[1]), (3,))
    else:
        dgate = jnp.sum(g32 * x32, axis=-1)
        nties = jnp.sum(is_max, axis=-1)
    ds = dgate * gate * (1.0 - gate)
    dmean, dmax = _plane_grads(ds, w.astype(jnp.float32))
    ties = jnp.maximum(nties, 1.0)
    dx = (g32 * gate[..., None] + dmean[..., None] / c
          + (dmax / ties)[..., None] * is_max).astype(x.dtype)
    # dw via the k*k einsum contraction — a single conv-as-wgrad (batch as
    # the contraction dim) measured 7.9 ms/step SLOWER (60.9 vs 53.0)
    return dx, _dw_contraction(ds, mean, mx, k, pad, h, wdt, w.dtype)


def _gate_bwd_saved_fwd(x, w, g, gate, mean, mx):
    return _gate_bwd_saved(x, w, g, gate, mean, mx), (x, w, g)


def _gate_bwd_saved_bwd(res, cotangents):
    x, w, g = res
    _, vjp = jax.vjp(_bwd_jnp, x, w, g)
    dx_, dw_, dg_ = vjp(cotangents)
    zero_plane = jnp.zeros(x.shape[:3], jnp.float32)
    return dx_, dw_, dg_, zero_plane, zero_plane, zero_plane


_gate_bwd_saved.defvjp(_gate_bwd_saved_fwd, _gate_bwd_saved_bwd)


# ---------------------------------------------------------------------------
# custom-VJP wrapper
# ---------------------------------------------------------------------------

@jax.custom_vjp
def fused_spatial_gate(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """sigmoid(conv_kxk([mean_c(x); max_c(x)], w)) * x with a hand-written
    backward (the measured-fastest configuration; autodiff through the
    forward costs ~17 ms/step more across the flagship's 49 instances).

    x: (B, H, W, C); w: (k, k, 2, 1) HWIO (``nn.Conv(1, (k, k))`` layout).
    Forward impl selected by SRADSGAN_TPU_SLAM_IMPL: conv (default) /
    taps / pallas.
    """
    if _pallas_ok(x):
        return _fwd_pallas_jvpsafe(x, w)
    if _impl() == "conv":
        return _gate_conv_reference(x, w)
    return _gate_reference(x, w)


def _fwd_with_stats(x, w):
    """Forward that also returns the stat planes + gate for the
    saved-residual backward.  (Inside the custom-VJP forward — never
    autodiff'd, so the variadic stat reduce is safe here.)"""
    x32 = x.astype(jnp.float32)
    mean, mx = _pools_sel(x32)
    w32 = w.astype(jnp.float32)
    if _impl() == "conv":
        stack = jnp.stack([mean, mx], axis=-1)
        s = _stat_conv(stack, w32)
    else:
        s = _conv_taps([mean, mx], w32)
    gate = jax.nn.sigmoid(s)
    out = (gate[..., None] * x32).astype(x.dtype)
    return out, gate, mean, mx


def _vjp_fwd(x, w):
    if _pallas_ok(x):
        return _fwd_pallas_jvpsafe(x, w), (x, w, None, None, None)
    out, gate, mean, mx = _fwd_with_stats(x, w)
    return out, (x, w, gate, mean, mx)


def _vjp_bwd(res, g):
    x, w, gate, mean, mx = res
    if gate is None:  # Pallas path: fused recomputing backward
        return _gate_bwd(x, w, g)
    return _gate_bwd_saved(x, w, g, gate, mean, mx)


fused_spatial_gate.defvjp(_vjp_fwd, _vjp_bwd)
