"""Attention blocks shared across the model zoo.

One implementation each for the four attention families the reference
duplicates across files:

- ``ChannelGate`` — CBAM-style channel attention; the reference's CLAM
  (model/sradsgan.py:101-127) and base_networks.ChannelAttention:366.
- ``SpatialGate`` — CBAM-style spatial attention; SLAM (sradsgan.py:129-151)
  and base_networks.SpatialAttention:424.
- ``SpatialSelfAttention`` — full spatial self-attention with learned
  residual gain; SGAM (sradsgan.py:153-176) and PAM_Module
  (base_networks.py:480).
- ``ChannelSelfAttention`` — Gram-matrix channel self-attention with the
  max-subtraction trick; CGAM (sradsgan.py:178-213) and CAM_Module
  (base_networks.py:513).
- ``CALayer`` — RCAN squeeze-excite channel attention (drcan.py:95-113).
- ``LocalAttention`` — the CA/SA composition grammar ('CA', 'SA', 'CA-SA',
  'SA-CA', 'CA|SA') with optional fusion conv, used by RAB/ResGroup/GAB
  (sradsgan.py:242-275).

All NHWC; self-attention is expressed as einsums so XLA maps the
contractions onto the MXU with static shapes.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.blocks import default_kernel_init

Dtype = Any


class ChannelGate(nn.Module):
    """sigmoid(MLP(avgpool) + MLP(maxpool)) * x, shared MLP, no biases."""

    ratio: int = 16
    pool_mode: str = "Avg|Max"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        hidden = max(c // self.ratio, 1)
        fc1 = nn.Dense(hidden, use_bias=False,
                       kernel_init=default_kernel_init, dtype=self.dtype)
        fc2 = nn.Dense(c, use_bias=False,
                       kernel_init=default_kernel_init, dtype=self.dtype)
        mlp = lambda v: fc2(nn.relu(fc1(v)))

        if self.pool_mode == "Avg|Max":
            # Fused single-pass avg+max (Pallas on TPU; ops/pallas/pooling.py)
            from sradsgan_tpu.ops.pallas.pooling import fused_avg_max_pool
            avg, mx = fused_avg_max_pool(x)
            # ONE stacked MLP pass over [avg; mx] instead of two: the MLP
            # matmuls are tiny ((B, C) @ (C, C/16)) and latency-dominated at
            # 48 gate instances per step — mlp(avg) + mlp(mx) is computed as
            # split(mlp(concat)), mathematically identical (Dense is
            # row-wise).  SRADSGAN_TPU_CLAM_MLP=twopass restores the
            # two-call formulation (trace-time A/B knob: the full-step
            # bench read 8.91 MP/s before the stacked change landed and
            # 8.62 after, in a commit that changed several things — the
            # knob isolates this one).
            import os
            if os.environ.get("SRADSGAN_TPU_CLAM_MLP", "") == "twopass":
                out = mlp(avg) + mlp(mx)
            else:
                o = mlp(jnp.concatenate([avg, mx], axis=0))
                b = x.shape[0]
                out = o[:b] + o[b:]
        else:
            out = 0.0
            if "Avg" in self.pool_mode:
                out = out + mlp(jnp.mean(x, axis=(1, 2)))
            if "Max" in self.pool_mode:
                out = out + mlp(jnp.max(x, axis=(1, 2)))
        return nn.sigmoid(out)[:, None, None, :] * x


class _GateKernel(nn.Module):
    """Bare conv-kernel param holder (named ``Conv_0`` for checkpoint
    compatibility with the previous ``nn.Conv`` formulation)."""

    kernel_size: int = 7
    in_feats: int = 2

    @nn.compact
    def __call__(self):
        return self.param("kernel", default_kernel_init,
                          (self.kernel_size, self.kernel_size,
                           self.in_feats, 1))


class _DenseKernel(nn.Module):
    """Bare Dense-kernel param holder (named for checkpoint compatibility
    with the ``nn.Dense`` formulation)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", default_kernel_init, self.shape)


class _CGParams(nn.Module):
    """ChannelGate's param tree (Dense_0/Dense_1 kernels) without its ops."""

    c: int
    ratio: int = 16

    @nn.compact
    def __call__(self):
        hidden = max(self.c // self.ratio, 1)
        w1 = _DenseKernel((self.c, hidden), name="Dense_0")()
        w2 = _DenseKernel((hidden, self.c), name="Dense_1")()
        return w1, w2


class _SGParams(nn.Module):
    """SpatialGate's param tree (Conv_0 kernel) without its ops."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self):
        return _GateKernel(self.kernel_size, 2, name="Conv_0")()


class _Conv1x1Params(nn.Module):
    """1x1-conv param holder (Conv_0 kernel+bias names)."""

    c: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", default_kernel_init,
                       (1, 1, self.c, self.c))
        b = self.param("bias", nn.initializers.zeros, (self.c,))
        return k, b


class FusedCASATail(nn.Module):
    """The fused 'CA-SA' + 1x1 fuse + residual tail (Pallas megakernel).

    Parameter tree is IDENTICAL to ``LocalAttention(mode='CA-SA',
    add_conv=True)`` (ChannelGate_0/Dense_{0,1}, SpatialGate_0/Conv_0,
    Conv_0) so checkpoints swap freely between the fused and unfused
    formulations.  Instantiate with ``name='LocalAttention_0'`` from
    RAB/ResGroup.  Gate math runs float32 (the unfused bf16 path computes
    the CLAM MLP in bf16 — the fused op is slightly MORE precise there).
    """

    ratio: int = 16
    kernel_size: int = 7

    @nn.compact
    def __call__(self, t, x_res):
        c = t.shape[-1]
        w1, w2 = _CGParams(c, self.ratio, name="ChannelGate_0")()
        slam_k = _SGParams(self.kernel_size, name="SpatialGate_0")()
        fuse_k, fuse_b = _Conv1x1Params(c, name="Conv_0")()
        from sradsgan_tpu.ops.pallas.rab_tail import fused_rab_tail
        return fused_rab_tail(t, x_res, w1, w2, slam_k, fuse_k[0, 0],
                              fuse_b)


def use_fused_rab_tail(mode: str, pool_mode: str, add_conv: bool) -> bool:
    """Trace-time knob: SRADSGAN_TPU_RAB_TAIL=fused enables the megakernel
    for the exact composition it implements."""
    import os
    return (os.environ.get("SRADSGAN_TPU_RAB_TAIL", "") == "fused"
            and mode == "CA-SA" and pool_mode == "Avg|Max" and add_conv)


class SpatialGate(nn.Module):
    """sigmoid(conv7x7([mean_c; max_c])) * x, no bias.

    Dispatches to ops/spatial_gate.py, which selects among the
    mathematically-equivalent formulations via SRADSGAN_TPU_SLAM_IMPL
    (default: the measured-fastest ``conv`` — conv-stencil forward +
    saved-residual backward, docs/PERF.md; ``taps`` and a fused Pallas
    kernel remain available).  Gate math is float32 on every backend.
    """

    kernel_size: int = 7
    pool_mode: str = "Avg|Max"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        from sradsgan_tpu.ops.spatial_gate import spatial_gate_apply
        n_stats = ("Avg" in self.pool_mode) + ("Max" in self.pool_mode)
        kernel = _GateKernel(self.kernel_size, n_stats, name="Conv_0")()
        return spatial_gate_apply(x, kernel, pool_mode=self.pool_mode)


def _chunked_attention(q, k, v, target_chunk: int = 768):
    """Flash-style query-chunked attention (opt-in,
    SRADSGAN_TPU_SGAM_IMPL=chunked): process query blocks through a
    rematerialized ``lax.map`` so neither the forward residuals nor the
    backward ever hold the full (B, HW, HW) energy — per-block energies are
    recomputed in the backward (jax.checkpoint).  Same math as the bf16
    energy path (f32 row statistics)."""
    import jax

    b, n, d = q.shape
    chunk = next((c for c in range(min(target_chunk, n), 0, -1)
                  if n % c == 0))
    nb = n // chunk
    qb = q.reshape(b, nb, chunk, d).transpose(1, 0, 2, 3)   # (nb, b, m, d)

    def block(q_blk):
        e = jnp.einsum("bmd,bkd->bmk", q_blk, k,
                       preferred_element_type=jnp.bfloat16)
        mx = jnp.max(e, axis=-1, keepdims=True).astype(jnp.float32)
        p = jnp.exp(e.astype(jnp.float32) - mx)
        s = jnp.sum(p, axis=-1, keepdims=True)
        a = (p / s).astype(v.dtype)
        return jnp.einsum("bmk,bkc->bmc", a, v)

    out = jax.lax.map(jax.checkpoint(block), qb)            # (nb, b, m, c)
    return out.transpose(1, 0, 2, 3).reshape(b, n, v.shape[-1])


class SpatialSelfAttention(nn.Module):
    """Position self-attention with zero-init residual gain (SGAM/PAM).

    q, k project to C//8; attention is softmax over key positions; output is
    ``gamma * attn(v) + x`` with gamma initialized to 0 so the block starts
    as identity (reference sradsgan.py:160 ``Parameter(torch.zeros(1))``).
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        inner = max(c // 8, 1)
        q = nn.Conv(inner, (1, 1), kernel_init=default_kernel_init,
                    dtype=self.dtype)(x).reshape(b, h * w, inner)
        k = nn.Conv(inner, (1, 1), kernel_init=default_kernel_init,
                    dtype=self.dtype)(x).reshape(b, h * w, inner)
        v = nn.Conv(c, (1, 1), kernel_init=default_kernel_init,
                    dtype=self.dtype)(x).reshape(b, h * w, c)
        import os
        impl = os.environ.get("SRADSGAN_TPU_SGAM_IMPL", "")
        if os.environ.get("SRADSGAN_TPU_SGAM_F32", "") == "1":
            impl = "f32"  # back-compat knob
        if impl == "" and x.dtype == jnp.bfloat16 and h * w >= 2048:
            # bf16 default on TPU at large position counts: the flash
            # kernel — faster than the dense bf16-energy path (full
            # flagship x4 step 87.4 -> 85.0 ms at N=54^2) AND closer to
            # the exact-f32 softmax (f32 running row statistics,
            # golden-checked on device at N=2916; docs/PERF.md round 3).
            # Below ~2048 positions the (B, N, N) energy is only a few MB
            # and the kernel's pad-to-tile waste (e.g. 729 -> 1024 at the
            # x8 config's 27^2 trunk) outweighs the traffic it saves, so
            # the dense path stays.  SRADSGAN_TPU_SGAM_IMPL=dense restores
            # the bf16-energy path everywhere; =flash forces the kernel.
            from sradsgan_tpu.ops.sgam_flash import is_available
            if is_available(b):
                impl = "flash"
        if impl == "flash":
            from sradsgan_tpu.ops.sgam_flash import (
                flash_position_attention, is_available)
            if not is_available(b):
                raise RuntimeError(
                    "SRADSGAN_TPU_SGAM_IMPL=flash needs a TPU backend "
                    "(and, on a multi-chip mesh, a data mesh the batch "
                    "divides — ops/spmd.py)")
            # Precondition of the default bias-column mask: real attention
            # energies must stay |energy| << 1e4 so exp(-1e4 - m)
            # underflows to exactly 0.0 in f32 (ops/sgam_flash.py).  Here
            # energy = <q, k> over d=C//8=8 bf16 channels of conv outputs —
            # O(10) in practice, and bf16 inputs overflow long before 1e4
            # matters.  If SGAM inputs ever grow unbounded, set
            # SRADSGAN_TPU_SGAM_MASK=segments (the tested exact fallback).
            out = flash_position_attention(q, k, v).reshape(b, h, w, c)
        elif x.dtype == jnp.bfloat16 and impl == "chunked":
            out = _chunked_attention(q, k, v).reshape(b, h, w, c)
        elif x.dtype == jnp.bfloat16 and impl != "f32":
            # The (B, HW, HW) energy is the op's HBM cost (544 MB in f32 at
            # 54^2 x batch 16).  The QK contraction depth is only C//8, so
            # bf16 accumulation is safe; materialize energy/attn in bf16
            # and keep only the row statistics (max, sum) in f32.
            energy = jnp.einsum("bqd,bkd->bqk", q, k,
                                preferred_element_type=jnp.bfloat16)
            m = jnp.max(energy, axis=-1, keepdims=True).astype(jnp.float32)
            p = jnp.exp(energy.astype(jnp.float32) - m)
            s = jnp.sum(p, axis=-1, keepdims=True)
            attn = (p / s).astype(jnp.bfloat16)
            out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        else:
            # exact f32 softmax (the torch-parity formulation)
            energy = jnp.einsum("bqd,bkd->bqk", q, k,
                                preferred_element_type=jnp.float32)
            attn = nn.softmax(energy.astype(jnp.float32),
                              axis=-1).astype(v.dtype)
            out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class ChannelSelfAttention(nn.Module):
    """Gram-matrix channel attention with max-subtraction (CGAM/CAM).

    energy[i, j] = <x_i, x_j> over positions; attention row-softmaxed over
    ``max(energy) - energy``; output ``gamma * attn @ x + x``, gamma zero-init.
    """

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.reshape(b, h * w, c)
        # Gram + softmax in f32 regardless of compute dtype (bf16-safe)
        energy = jnp.einsum("bnc,bnd->bcd", flat, flat,
                            preferred_element_type=jnp.float32)
        energy = energy.astype(jnp.float32)
        energy_new = jnp.max(energy, axis=-1, keepdims=True) - energy
        attn = nn.softmax(energy_new, axis=-1).astype(flat.dtype)
        out = jnp.einsum("bcd,bnd->bnc", attn, flat).reshape(b, h, w, c)
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        return gamma.astype(x.dtype) * out + x


class CALayer(nn.Module):
    """RCAN squeeze-and-excite: sigmoid(conv(relu(conv(avgpool)))) * x."""

    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(max(c // self.reduction, 1), use_bias=True,
                     kernel_init=default_kernel_init, dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=True, kernel_init=default_kernel_init,
                     dtype=self.dtype)(s)
        return nn.sigmoid(s)[:, None, None, :] * x


class LocalAttention(nn.Module):
    """The reference's CA/SA composition grammar with optional fusion conv.

    mode: '' | 'CA' | 'SA' | 'CA-SA' | 'SA-CA' | 'CA|SA'
    '-' = sequential (+1x1 conv if add_conv), '|' = parallel concat + 1x1.
    Reference: model/sradsgan.py:242-275.
    """

    mode: str = "CA-SA"
    pool_mode: str = "Avg|Max"
    add_conv: bool = True
    ratio: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if self.mode == "":
            return nn.Conv(c, (1, 1), kernel_init=default_kernel_init,
                           dtype=self.dtype)(x)
        ca = (ChannelGate(self.ratio, self.pool_mode, dtype=self.dtype)
              if "CA" in self.mode else None)
        sa = (SpatialGate(7, self.pool_mode, dtype=self.dtype)
              if "SA" in self.mode else None)
        if self.mode == "CA":
            return ca(x)
        if self.mode == "SA":
            return sa(x)
        if self.mode == "CA-SA":
            out = sa(ca(x))
        elif self.mode == "SA-CA":
            out = ca(sa(x))
        elif self.mode == "CA|SA":
            out = jnp.concatenate([ca(x), sa(x)], axis=-1)
            return nn.Conv(c, (1, 1), kernel_init=default_kernel_init,
                           dtype=self.dtype)(out)
        else:
            raise ValueError(f"unknown attention mode {self.mode!r}")
        if self.add_conv:
            out = nn.Conv(c, (1, 1), kernel_init=default_kernel_init,
                          dtype=self.dtype)(out)
        return out


class GlobalAttention(nn.Module):
    """CGAM/SGAM composition for the global attention block (GAB).

    Same grammar as :class:`LocalAttention` but with the self-attention
    modules.  Reference: model/sradsgan.py:365-418 (GAB_UP attention part).
    """

    mode: str = "CA-SA"
    add_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        ca = (ChannelSelfAttention(dtype=self.dtype)
              if "CA" in self.mode else None)
        sa = (SpatialSelfAttention(dtype=self.dtype)
              if "SA" in self.mode else None)
        if self.mode == "CA":
            return ca(x)
        if self.mode == "SA":
            return sa(x)
        if self.mode == "CA-SA":
            out = sa(ca(x))
        elif self.mode == "SA-CA":
            out = ca(sa(x))
        elif self.mode == "CA|SA":
            out = jnp.concatenate([ca(x), sa(x)], axis=-1)
            return nn.Conv(c, (1, 1), kernel_init=default_kernel_init,
                           dtype=self.dtype)(out)
        else:
            raise ValueError(f"unknown attention mode {self.mode!r}")
        if self.add_conv:
            out = nn.Conv(c, (1, 1), kernel_init=default_kernel_init,
                          dtype=self.dtype)(out)
        return out
