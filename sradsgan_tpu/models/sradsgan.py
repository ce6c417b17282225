"""SRADSGAN generator — the flagship stratified dense-sampling network.

Reference: model/sradsgan.py:420-468 (GeneratorResNet).  Structure:

- MSB multi-scale stem: 3x3 || 1x1->3x3 || 1x1 branches, concat + 1x1 fuse,
  LeakyReLU(0.01) (sradsgan.py:326-345);
- conv1 head: 3x3 + LeakyReLU(0.01);
- 12 ResGroups x 3 RAB; each RAB is a 4x-wide conv pair (64->256->64,
  LeakyReLU 0.2 between) followed by CLAM channel + SLAM spatial local
  attention and a 1x1 fuse conv, residual (sradsgan.py:215-275);
- stratified dense sampling: outputs of conv1+MSB and of *every* group are
  summed into a running ``out_all`` while ``out`` chains group to group
  (sradsgan.py:450-462);
- GAB_UP: CGAM channel + SGAM spatial global self-attention, 1x1 fuse, then
  the shared sub-pixel upsample law (sradsgan.py:365-418);
- plain 3x3 output conv.

TPU notes: everything static-shaped NHWC.  The dense-sampling running sum is
a Python loop over 12 groups — unrolled at trace time into one fused graph.
"""

from __future__ import annotations

from typing import Any, Optional

from flax import linen as nn

from sradsgan_tpu.nn.attention import (FusedCASATail, GlobalAttention,
                                       LocalAttention, use_fused_rab_tail)
from sradsgan_tpu.nn.blocks import ConvBlock, default_kernel_init, UpsampleHead

import jax.numpy as jnp

Dtype = Any


class MSB(nn.Module):
    """Multi-scale input stem (reference sradsgan.py:326-345)."""

    features: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        f = self.features
        out1 = nn.Conv(f, (3, 3), padding="SAME",
                       kernel_init=default_kernel_init, dtype=self.dtype)(x)
        out2 = nn.Conv(f, (1, 1), kernel_init=default_kernel_init,
                       dtype=self.dtype)(x)
        out2 = nn.Conv(f, (3, 3), padding="SAME",
                       kernel_init=default_kernel_init, dtype=self.dtype)(out2)
        out3 = nn.Conv(f, (1, 1), kernel_init=default_kernel_init,
                       dtype=self.dtype)(x)
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        out = nn.Conv(f, (1, 1), kernel_init=default_kernel_init,
                      dtype=self.dtype)(out)
        return nn.leaky_relu(out, 0.01)


class RAB(nn.Module):
    """Residual attention block: wide conv pair + CLAM/SLAM (sradsgan.py:215-275)."""

    features: int = 64
    expand: int = 4
    la_mode: str = "CA-SA"
    pool_mode: str = "Avg|Max"
    add_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        f = self.features
        out = nn.Conv(self.expand * f, (3, 3), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(x)
        out = nn.leaky_relu(out, 0.2)
        out = nn.Conv(f, (3, 3), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(out)
        if use_fused_rab_tail(self.la_mode, self.pool_mode, self.add_conv):
            # Pallas megakernel: CLAM+SLAM+fuse+residual in one VMEM pass
            # (param tree identical to the unfused formulation)
            return FusedCASATail(name="LocalAttention_0")(out, x)
        out = LocalAttention(self.la_mode, self.pool_mode, self.add_conv,
                             dtype=self.dtype)(out)
        return out + x


class ResGroup(nn.Module):
    """n RABs + group-level local attention + skip (sradsgan.py:277-324)."""

    features: int = 64
    n_blocks: int = 3
    rla_mode: str = "CA-SA"
    bla_mode: str = "CA-SA"
    pool_mode: str = "Avg|Max"
    add_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        if _scan_mode() == "blocks":
            Scan = nn.scan(_RABScanBody, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=self.n_blocks)
            out, _ = Scan(self.features, self.bla_mode, self.pool_mode,
                          self.add_conv, self.dtype, name="Blocks")(x, None)
        else:
            out = x
            for _ in range(self.n_blocks):
                out = RAB(self.features, la_mode=self.bla_mode,
                          pool_mode=self.pool_mode, add_conv=self.add_conv,
                          dtype=self.dtype)(out)
        if use_fused_rab_tail(self.rla_mode, self.pool_mode, self.add_conv):
            return FusedCASATail(name="LocalAttention_0")(out, x)
        out = LocalAttention(self.rla_mode, self.pool_mode, self.add_conv,
                             dtype=self.dtype)(out)
        return out + x


def _scan_mode() -> str:
    """SRADSGAN_TPU_SCAN_GROUPS: '' (off, unrolled — default), 'groups'
    (nn.scan over the 12 ResGroups with stacked params), or 'blocks'
    (additionally nn.scan over each group's 3 RABs).

    Round-5 structural experiment against the RAB materialization chain
    (docs/PERF.md round-4 trace: ~18.2k ops/step, ~8-9 ms of per-parameter
    optimizer soup, 4.6 ms of param relayout copies): the scan collapses
    the program to one group body + XLA while-loop, shrinking the
    executable ~12x and the G param tree from ~400 leaves to ~40 stacked
    ones.  The math is identical (same ops, same order); params repack
    losslessly between formulations via :func:`to_scan_params` /
    :func:`from_scan_params` (tests/test_models.py).
    """
    import os
    return os.environ.get("SRADSGAN_TPU_SCAN_GROUPS", "")


class _RABScanBody(nn.Module):
    """nn.scan body over a group's RABs (carry = trunk tensor)."""

    features: int
    bla_mode: str
    pool_mode: str
    add_conv: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, carry, _):
        out = RAB(self.features, la_mode=self.bla_mode,
                  pool_mode=self.pool_mode, add_conv=self.add_conv,
                  dtype=self.dtype)(carry)
        return out, None


class _GroupScanBody(nn.Module):
    """nn.scan body over ResGroups (carry = (out, out_all) — the chained
    trunk and the stratified dense-sampling running sum,
    reference sradsgan.py:450-462)."""

    features: int
    n_blocks: int
    rla_mode: str
    bla_mode: str
    pool_mode: str
    add_conv: bool
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, carry, _):
        out, out_all = carry
        out = ResGroup(self.features, self.n_blocks, self.rla_mode,
                       self.bla_mode, self.pool_mode, self.add_conv,
                       dtype=self.dtype)(out)
        return (out, out_all + out), None


def to_scan_params(params, n_groups: int, n_blocks: int,
                   blocks: bool = False):
    """Repack an unrolled SRADSGAN param tree (ResGroup_0..N-1) into the
    nn.scan formulation's stacked tree (GroupScan/ResGroup_0 with a leading
    group axis; with ``blocks`` also Blocks/RAB_0 with a block axis)."""
    import jax

    def blocks_repack(g):
        rabs = [g[f"RAB_{i}"] for i in range(n_blocks)]
        rest = {k: v for k, v in g.items() if not k.startswith("RAB_")}
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *rabs)
        return {**rest, "Blocks": {"RAB_0": stacked}}

    groups = [params[f"ResGroup_{i}"] for i in range(n_groups)]
    if blocks:
        groups = [blocks_repack(g) for g in groups]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *groups)
    rest = {k: v for k, v in params.items() if not k.startswith("ResGroup_")}
    return {**rest, "GroupScan": {"ResGroup_0": stacked}}


def from_scan_params(params, n_groups: int, n_blocks: int,
                     blocks: bool = False):
    """Inverse of :func:`to_scan_params`."""
    import jax

    def blocks_unpack(g):
        stacked = g["Blocks"]["RAB_0"]
        rest = {k: v for k, v in g.items() if k != "Blocks"}
        for i in range(n_blocks):
            rest[f"RAB_{i}"] = jax.tree.map(lambda x, i=i: x[i], stacked)
        return rest

    stacked = params["GroupScan"]["ResGroup_0"]
    out = {k: v for k, v in params.items() if k != "GroupScan"}
    for i in range(n_groups):
        g = jax.tree.map(lambda x, i=i: x[i], stacked)
        if blocks:
            g = blocks_unpack(g)
        out[f"ResGroup_{i}"] = g
    return out


class SRADSGANGenerator(nn.Module):
    scale: int = 4
    num_channels: int = 3
    base_filters: int = 64
    n_groups: int = 12
    n_blocks: int = 3
    rla_mode: str = "CA-SA"
    bla_mode: str = "CA-SA"
    ga_mode: str = "CA-SA"
    pool_mode: str = "Avg|Max"
    add_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.base_filters
        msb = MSB(f, dtype=self.dtype)(x)
        out = nn.Conv(f, (3, 3), padding="SAME",
                      kernel_init=default_kernel_init, dtype=self.dtype)(x)
        out = nn.leaky_relu(out, 0.01)

        out_all = msb + out
        if _scan_mode() in ("groups", "blocks"):
            Scan = nn.scan(_GroupScanBody, variable_axes={"params": 0},
                           split_rngs={"params": True},
                           length=self.n_groups)
            (out, out_all), _ = Scan(
                f, self.n_blocks, self.rla_mode, self.bla_mode,
                self.pool_mode, self.add_conv, self.dtype,
                name="GroupScan")((out, out_all), None)
        else:
            for _ in range(self.n_groups):  # stratified dense sampling
                out = ResGroup(f, self.n_blocks, self.rla_mode,
                               self.bla_mode, self.pool_mode, self.add_conv,
                               dtype=self.dtype)(out)
                out_all = out_all + out

        # GAB_UP: global attention + sub-pixel upsampling (sradsgan.py:365-418)
        out_all = GlobalAttention(self.ga_mode, self.add_conv,
                                  dtype=self.dtype)(out_all)
        out_all = UpsampleHead(f, self.scale, activation="lrelu01",
                               share_stages=True, dtype=self.dtype)(out_all)
        return ConvBlock(self.num_channels, 3, dtype=self.dtype)(out_all)
