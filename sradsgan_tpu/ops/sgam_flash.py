"""Flash formulation of the global position attention (SGAM / PAM).

The reference SGAM (model/sradsgan.py:153-176) computes
``out = softmax(q k^T) v`` over all HW positions with NO 1/sqrt(d)
scale.  At the flagship's 54^2 trunk that energy is (B, 2916, 2916) —
272 MB in bf16, 544 MB for the f32 softmax intermediate — and the XLA
formulations are bandwidth-bound on materializing it (docs/PERF.md
"SGAM bf16 energy").  FLOPs are trivial (~20 GFLOP), so a flash kernel
that keeps only running row statistics should collapse the op to its
input/output traffic.

This wraps the TPU Pallas flash-attention kernel from
``jax.experimental.pallas.ops.tpu.flash_attention`` (f32 running max/sum,
custom VJP for dq/dk/dv):

- positions are padded to the kernel's 128-aligned tiles; padded KEY
  positions get a different segment id so they receive exactly zero
  softmax weight (the real rows' distribution is unchanged — this is
  masking, not approximation);
- q/k (inner dim C//8 = 8) are zero-padded to v's head dim: zero columns
  add nothing to q.k^T, so the energy is bit-identical;
- ``sm_scale=1.0`` preserves the reference's unscaled softmax.

The result is numerically the flash re-association of the same softmax
(f32 statistics), matching the exact-f32 path to bf16 resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_TPU_PLATFORMS = ("tpu", "axon")


def is_available(batch: int = 1) -> bool:
    """True when the TPU flash kernel can run (trace-time gate).

    On a single device the kernel is called directly.  On a multi-chip
    mesh a raw pallas_call would be opaque to the SPMD partitioner, so
    :func:`flash_position_attention` wraps it in ``jax.shard_map`` over
    the data mesh's batch axis (each device runs the unchanged kernel on
    its local shard — the op is batch-parallel); that needs the active
    mesh to cover every device and ``batch`` to divide it
    (ops/spmd.py), otherwise the XLA formulations (which the partitioner
    splits like any other op) are the correct path and this returns False.
    """
    try:
        if jax.default_backend() not in _TPU_PLATFORMS:
            return False
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa
        from sradsgan_tpu.ops.spmd import plan_batch_kernel
        return plan_batch_kernel(batch) is not None
    except Exception:
        return False


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_MASK_BIAS = -1e4  # exp(-1e4) == 0.0 exactly in f32 — hard mask, no leak


def _mask_impl() -> str:
    import os
    return os.environ.get("SRADSGAN_TPU_SGAM_MASK", "bias")


def pad_for_kernel(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """Pad (B, N, d) q/k/v to the kernel's tile constraints.

    Returns ``(qp, kp, vp, ids, block)`` with qp/kp/vp of shape
    (B, 1 head, Np, d) and ``ids`` (B, Np) segment ids (1 = real position,
    0 = padding) or ``None`` when the bias-column mask is active (default).

    Exactness: zero columns added to q/k contribute nothing to q.k^T.  For
    padded KEY positions two equivalent maskings are implemented
    (SRADSGAN_TPU_SGAM_MASK):

    - ``bias`` (default, round 4): one of the zero pad columns is
      repurposed as a mask column — real queries get q[...,d_qk]=1 and
      padded keys get k[...,d_qk]=-1e4, so a padded key's energy is
      exactly -1e4 and its softmax weight exp(-1e4 - m) flushes to
      exactly 0.0 in f32 for any real row max m (energies are O(10)).
      No SegmentIds: the round-4 trace showed the segment-id machinery
      materializing ~2 ms/step of s32[16,3072,128] masks inside the
      kernel's XLA glue (scripts/trace_step.py).  Gradients through the
      mask column are exactly zero for real keys (k column is 0) and
      suppressed to 0.0 for padded ones (weight is 0), and the pad-slice
      discards them anyway.
    - ``segments``: padded key positions sit in a different segment so
      they get exactly zero softmax weight (the round-3 formulation).

    Padded QUERY rows are well-defined garbage either way (uniform-ish
    rows that the caller slices off).  Factored out so the mask/pad logic
    is testable on CPU against the flash module's jnp reference
    (tests/test_models.py).
    """
    b, n, d_qk = q.shape
    d_v = v.shape[-1]
    d = max(d_qk, d_v)
    if d > 128:  # "should be a multiple of 128 if larger" (kernel rule)
        d = _ceil_to(d, 128)
    # blocks must be 128-multiples AND divide the padded length
    block = 512 if n > 512 else _ceil_to(n, 128)
    n_pad = _ceil_to(n, block)

    def pad(x, dim):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, d - dim)))

    use_bias = _mask_impl() == "bias" and d_qk < d
    if use_bias:
        qp = pad(q, d_qk).at[:, :, d_qk].set(1.0)[:, None]
        kp = pad(k, d_qk).at[:, n:, d_qk].set(_MASK_BIAS)[:, None]
        ids = None
    else:
        qp = pad(q, d_qk)[:, None]          # (B, 1 head, Np, d)
        kp = pad(k, d_qk)[:, None]
        ids = jnp.concatenate([jnp.ones((b, n), jnp.int32),
                               jnp.zeros((b, n_pad - n), jnp.int32)], axis=1)
    vp = pad(v, d_v)[:, None]
    return qp, kp, vp, ids, block


def flash_position_attention(q: jnp.ndarray, k: jnp.ndarray,
                             v: jnp.ndarray) -> jnp.ndarray:
    """softmax(q k^T) v without materializing the (B, N, N) energy.

    q, k: (B, N, d_qk); v: (B, N, d_v).  Returns (B, N, d_v) in v.dtype.
    Unscaled softmax over key positions (reference SGAM semantics).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    from sradsgan_tpu.ops.spmd import (DIRECT, plan_batch_kernel,
                                       shard_map_batch)

    n, d_v = q.shape[1], v.shape[-1]
    qp, kp, vp, ids, block = pad_for_kernel(q, k, v)
    sizes = BlockSizes(
        block_q=block, block_k_major=block, block_k=block, block_b=1,
        block_q_major_dkv=block, block_k_major_dkv=block,
        block_k_dkv=block, block_q_dkv=block,
        block_k_major_dq=block, block_k_dq=block, block_q_dq=block)

    if ids is None:  # bias-column masking (default) — no segment machinery
        def call(qp, kp, vp):
            return flash_attention(qp, kp, vp, segment_ids=None,
                                   causal=False, sm_scale=1.0,
                                   block_sizes=sizes)
        args = (qp, kp, vp)
    else:
        def call(qp, kp, vp, ids):
            return flash_attention(qp, kp, vp,
                                   segment_ids=SegmentIds(q=ids, kv=ids),
                                   causal=False, sm_scale=1.0,
                                   block_sizes=sizes)
        args = (qp, kp, vp, ids)

    plan = plan_batch_kernel(q.shape[0])
    if plan is not DIRECT:
        # multi-chip: per-device kernel on the local batch shard (the op is
        # batch-parallel; the kernel's own custom VJP differentiates inside
        # the shard_map).  is_available(batch) guarantees plan is a Mesh.
        call = shard_map_batch(call, plan, len(args))
    out = call(*args)
    return out[:, 0, :n, :d_v].astype(v.dtype)
