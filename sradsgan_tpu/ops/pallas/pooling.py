"""Pallas TPU kernel: fused global average+max pooling.

Every CLAM/CBAM channel gate in the zoo (36 RABs x 12 groups in the
flagship, reference model/sradsgan.py:101-127) starts with BOTH a global
average pool and a global max pool of the same (B, H, W, C) tensor.  As two
separate reductions XLA reads the tensor from HBM twice; this kernel
produces both statistics in ONE pass (HBM-bandwidth-bound op -> 2x fewer
bytes moved).

Forward runs as a Pallas kernel on TPU-like backends; the backward is plain
jnp (a broadcast + a tie-normalized max mask) which XLA fuses with the
surrounding gate math.  On non-TPU backends the op falls back to jnp so the
CPU test mesh exercises identical semantics.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_TPU_PLATFORMS = ("tpu", "axon")


def _is_tpu_backend() -> bool:
    from sradsgan_tpu.ops.spmd import pallas_interpret
    try:
        return (jax.default_backend() in _TPU_PLATFORMS
                or pallas_interpret())
    except Exception:
        return False


def _avg_max_reference(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    return jnp.mean(x, axis=(1, 2)), jnp.max(x, axis=(1, 2))


def _avg_max_pallas(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, w, c = x.shape
    n = h * w
    x2 = x.reshape(b, n, c)

    def kernel(x_ref, avg_ref, max_ref):
        i = pl.program_id(0)
        data = x_ref[0]  # (n, c) block for this batch element
        avg_ref[i, :] = jnp.mean(data, axis=0)
        max_ref[i, :] = jnp.max(data, axis=0)

    # Outputs use full-array blocks (TPU tiling requires the last two block
    # dims divisible by (8, 128) or equal to the array dims); each grid step
    # writes its own row.
    from sradsgan_tpu.ops.spmd import pallas_interpret
    avg, mx = pl.pallas_call(
        kernel,
        interpret=pallas_interpret(),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((b, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, c), x.dtype),
            jax.ShapeDtypeStruct((b, c), x.dtype),
        ),
    )(x2)
    return avg, mx


@jax.custom_vjp
def fused_avg_max_pool(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, H, W, C) -> (avg (B, C), max (B, C)) in a single HBM pass.

    Pallas path is float32-only: Mosaic (as of jax 0.9) rejects bf16 blocks
    with sub-128 channel tails here, and for bf16 the XLA two-pass read
    moves fewer bytes than an f32 upcast would anyway.
    """
    import os
    if os.environ.get("SRADSGAN_TPU_NO_FUSED_POOL", "") == "1":
        return _avg_max_reference(x)  # measurement / escape hatch
    if _is_tpu_backend() and x.dtype == jnp.float32:
        from sradsgan_tpu.ops.spmd import (DIRECT, plan_batch_kernel,
                                           shard_map_batch)
        plan = plan_batch_kernel(x.shape[0])
        if plan is DIRECT:
            return _avg_max_pallas(x)
        if plan is not None:  # multi-chip: per-device kernel via shard_map
            return shard_map_batch(_avg_max_pallas, plan, 1,
                                   out_batched=(True, True))(x)
    return _avg_max_reference(x)


def _fwd(x):
    avg, mx = fused_avg_max_pool(x)
    return (avg, mx), x


def _bwd(x, grads):
    davg, dmax = grads
    n = x.shape[1] * x.shape[2]
    g_avg = (davg / n)[:, None, None, :]
    # Recompute the max HERE rather than reusing the forward's value: the
    # Pallas/XLA forward reduction can differ by 1 ULP in bf16, and an
    # exact-equality mask against a foreign max can then be all-zero —
    # ties==0 would divide to inf.  Recomputation + a >=1 guard makes the
    # mask provably non-empty.
    mx = jnp.max(x, axis=(1, 2), keepdims=True)
    is_max = (x == mx).astype(jnp.float32)
    ties = jnp.maximum(jnp.sum(is_max, axis=(1, 2), keepdims=True), 1.0)
    g_max = (is_max / ties).astype(x.dtype) * dmax[:, None, None, :]
    return (jnp.broadcast_to(g_avg, x.shape) + g_max,)


fused_avg_max_pool.defvjp(_fwd, _bwd)
