"""Import reference-trained torch checkpoints into sradsgan_tpu param trees.

Name-keyed mappers from the reference's ``state_dict`` layouts to our Flax
module trees, for cross-framework parity checks and for users migrating
reference-trained ``generator_param*.pkl`` weights.  Conv kernels transpose
OIHW -> HWIO; 1x1 attention-MLP convs become Dense kernels (in, out).

Covered: EDSR (model/edsr.py Net) and the flagship SRADSGAN generator
(model/sradsgan.py GeneratorResNet).  Validated numerically in
tests/test_reference_parity.py against the reference's own torch modules.
"""

from __future__ import annotations

import math
from typing import Any, Dict

import numpy as np


def _k(w: np.ndarray) -> np.ndarray:
    """OIHW conv weight -> HWIO kernel."""
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32)


def _dense(w: np.ndarray) -> np.ndarray:
    """(out, in, 1, 1) 1x1-conv weight -> Dense (in, out) kernel."""
    return np.transpose(w[:, :, 0, 0], (1, 0)).astype(np.float32)


def _as_np(state: Dict[str, Any]) -> Dict[str, np.ndarray]:
    return {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
            for k, v in state.items()}


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    assert node[path[-1]].shape == value.shape, (
        path, node[path[-1]].shape, value.shape)
    node[path[-1]] = value


def import_edsr(state: Dict[str, Any], params, num_residuals: int = 32,
                scale: int = 4):
    """model/edsr.py Net state_dict -> EDSR params."""
    s = _as_np(state)
    params = _copy(params)

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    conv("input_conv.conv", "ConvBlock_0", "Conv_0")
    for i in range(num_residuals):
        conv(f"residual_layers.{i}.conv1", f"ResBlock_{i}", "ConvBlock_0",
             "Conv_0")
        conv(f"residual_layers.{i}.conv2", f"ResBlock_{i}", "ConvBlock_1",
             "Conv_0")
    conv("mid_conv.conv", "ConvBlock_1", "Conv_0")
    stages = (int(math.log2(scale)) if scale & (scale - 1) == 0
              else int(round(math.log(scale, 3))))
    # torch upsampling Sequential: [conv, shuffle, act] per stage
    for n in range(stages):
        conv(f"upsampling.{3 * n}", "UpsampleHead_0", f"Conv_{n}")
    conv("output_conv.conv", "ConvBlock_2", "Conv_0")
    return params


def _local_attention(s, prefix, params, *base):
    """CLAM + SLAM + 1x1 fuse conv (reference RAB/ResGroup attention)."""
    _set(params, base + ("ChannelGate_0", "Dense_0", "kernel"),
         _dense(s[f"{prefix}.ca.fc1.weight"]))
    _set(params, base + ("ChannelGate_0", "Dense_1", "kernel"),
         _dense(s[f"{prefix}.ca.fc2.weight"]))
    _set(params, base + ("SpatialGate_0", "Conv_0", "kernel"),
         _k(s[f"{prefix}.sa.conv1.weight"]))
    _set(params, base + ("Conv_0", "kernel"), _k(s[f"{prefix}.conv.weight"]))
    _set(params, base + ("Conv_0", "bias"),
         s[f"{prefix}.conv.bias"].astype(np.float32))


def import_sradsgan(state: Dict[str, Any], params, n_groups: int = 12,
                    n_blocks: int = 3, scale: int = 4):
    """model/sradsgan.py GeneratorResNet state_dict -> SRADSGANGenerator."""
    s = _as_np(state)
    params = _copy(params)

    def conv(torch_name, *path, bias=True):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        if bias:
            _set(params, path + ("bias",),
                 s[f"{torch_name}.bias"].astype(np.float32))

    # head
    conv("conv1.0", "Conv_0")
    # MSB: conv1 (3x3), conv2.0 (1x1), conv2.1 (3x3), conv3 (1x1), conv (1x1)
    conv("MSB.conv1", "MSB_0", "Conv_0")
    conv("MSB.conv2.0", "MSB_0", "Conv_1")
    conv("MSB.conv2.1", "MSB_0", "Conv_2")
    conv("MSB.conv3", "MSB_0", "Conv_3")
    conv("MSB.conv", "MSB_0", "Conv_4")
    # residual groups
    for g in range(n_groups):
        for b in range(n_blocks):
            p = f"res_groups.{g}.RG.{b}"
            conv(f"{p}.conv1", f"ResGroup_{g}", f"RAB_{b}", "Conv_0")
            conv(f"{p}.conv2", f"ResGroup_{g}", f"RAB_{b}", "Conv_1")
            _local_attention(s, p, params, f"ResGroup_{g}", f"RAB_{b}",
                             "LocalAttention_0")
        _local_attention(s, f"res_groups.{g}", params, f"ResGroup_{g}",
                         "LocalAttention_0")
    # global attention (CGAM gamma; SGAM q/k/v convs + gamma; fuse conv)
    ga = ("GlobalAttention_0",)
    _set(params, ga + ("ChannelSelfAttention_0", "gamma"),
         s["GAB_UP.ca.gamma"].astype(np.float32))
    for i, name in enumerate(("query_conv", "key_conv", "value_conv")):
        conv(f"GAB_UP.sa.{name}", *ga, "SpatialSelfAttention_0", f"Conv_{i}")
    _set(params, ga + ("SpatialSelfAttention_0", "gamma"),
         s["GAB_UP.sa.gamma"].astype(np.float32))
    conv("GAB_UP.conv", *ga, "Conv_0")
    # upsampling stages: Sequential [conv, shuffle, lrelu] per stage
    stages = (int(math.log2(scale)) if scale & (scale - 1) == 0
              else int(round(math.log(scale, 3))))
    for n in range(stages):
        conv(f"GAB_UP.upsampling.{3 * n}", "UpsampleHead_0", f"Conv_{n}")
    # output conv
    conv("conv3.0", "ConvBlock_0", "Conv_0")
    return params


def _copy(params):
    import jax
    return jax.tree.map(np.array, params)
