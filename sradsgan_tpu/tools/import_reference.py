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
    # upsampling conv is SHARED across stages (the reference appends one
    # module list repeatedly; edsr.py:41-58) -> single state_dict entry
    conv("upsampling.0", "UpsampleHead_0", "Conv_0")
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
    # upsampling conv SHARED across stages (sradsgan.py:380-394)
    conv("GAB_UP.upsampling.0", "UpsampleHead_0", "Conv_0")
    # output conv
    conv("conv3.0", "ConvBlock_0", "Conv_0")
    return params


def import_drcan(state: Dict[str, Any], params, n_resgroups: int = 5,
                 n_resblocks: int = 10, scale: int = 4):
    """model/drcan.py RCAN state_dict -> DRCAN params.

    torch layout: head.0; body.{g}.body.{b}(.body.0 conv, .body.2 conv,
    .body.3 CALayer conv_du.0/.2); body.{g}.body.{n_resblocks} group conv;
    body.{n_resgroups} final conv; tail.0.{k} upsampler convs; tail.1 out.
    """
    s = _as_np(state)
    params = _copy(params)

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    def ca(torch_prefix, *base):
        # CALayer 1x1 convs (bias=True) -> our CALayer Dense_0/Dense_1
        for i, idx in enumerate((0, 2)):
            w = s[f"{torch_prefix}.conv_du.{idx}.weight"]
            _set(params, base + (f"Dense_{i}", "kernel"), _dense(w))
            _set(params, base + (f"Dense_{i}", "bias"),
                 s[f"{torch_prefix}.conv_du.{idx}.bias"].astype(np.float32))

    conv("head.0", "ConvBlock_0", "Conv_0")
    rcab = 0
    for g in range(n_resgroups):
        for b in range(n_resblocks):
            p = f"body.{g}.body.{b}.body"
            conv(f"{p}.0", f"RCAB_{rcab}", "ConvBlock_0", "Conv_0")
            conv(f"{p}.2", f"RCAB_{rcab}", "ConvBlock_1", "Conv_0")
            ca(f"{p}.3", f"RCAB_{rcab}", "CALayer_0")
            rcab += 1
        conv(f"body.{g}.body.{n_resblocks}", f"ConvBlock_{1 + g}", "Conv_0")
    conv(f"body.{n_resgroups}", f"ConvBlock_{1 + n_resgroups}", "Conv_0")
    stages = (int(math.log2(scale)) if scale & (scale - 1) == 0
              else int(round(math.log(scale, 3))))
    for n in range(stages):
        conv(f"tail.0.{2 * n}", "UpsampleHead_0", f"Conv_{n}")
    conv("tail.1", f"ConvBlock_{2 + n_resgroups}", "Conv_0")
    return params


def import_dssr(state: Dict[str, Any], params, n_groups: int = 3,
                n_blocks: int = 10, scale: int = 4):
    """model/dssr.py GeneratorResNet state_dict -> DSSR params.

    torch layout: conv1.0; res_groups.{g}.RG.{b} WAB (conv1, conv2,
    ca.fc1/fc2 no-bias 1x1) + res_groups.{g}.conv; shared UP.upsampling
    convs; conv3.0.
    """
    s = _as_np(state)
    params = _copy(params)

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    conv("conv1.0", "ConvBlock_0", "Conv_0")
    for g in range(n_groups):
        for b in range(n_blocks):
            p = f"res_groups.{g}.RG.{b}"
            conv(f"{p}.conv1", f"DSSRGroup_{g}", f"WAB_{b}", "ConvBlock_0",
                 "Conv_0")
            conv(f"{p}.conv2", f"DSSRGroup_{g}", f"WAB_{b}", "ConvBlock_1",
                 "Conv_0")
            _set(params, (f"DSSRGroup_{g}", f"WAB_{b}", "ChannelGate_0",
                          "Dense_0", "kernel"),
                 _dense(s[f"{p}.ca.fc1.weight"]))
            _set(params, (f"DSSRGroup_{g}", f"WAB_{b}", "ChannelGate_0",
                          "Dense_1", "kernel"),
                 _dense(s[f"{p}.ca.fc2.weight"]))
        conv(f"res_groups.{g}.conv", f"DSSRGroup_{g}", "ConvBlock_0",
             "Conv_0")
    # upsampling conv SHARED across stages (dssr.py:124-146)
    conv("UP.upsampling.0", "UpsampleHead_0", "Conv_0")
    conv("conv3.0", "ConvBlock_1", "Conv_0")
    return params


def import_ndsrgan(state: Dict[str, Any], params, n_dcrdb: int = 23,
                   scale: int = 4):
    """model/ndsrgan.py GeneratorResNet state_dict -> NDSRGANGenerator."""
    s = _as_np(state)
    params = _copy(params)

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    conv("conv1.0", "ConvBlock_0", "Conv_0")
    for kk in range(n_dcrdb):
        tp = f"DCRDB_block.DRRDB{kk + 1}"
        for r in range(3):
            for j in range(4):
                conv(f"{tp}.RDB{r + 1}.CL_blocks.{j}.0", f"DCRDB_{kk}",
                     f"DenseBlock_{r}", f"ConvBlock_{j}", "Conv_0")
            conv(f"{tp}.RDB{r + 1}.conv", f"DCRDB_{kk}", f"DenseBlock_{r}",
                 "ConvBlock_4", "Conv_0")
        conv(f"{tp}.conv", f"DCRDB_{kk}", "ConvBlock_0", "Conv_0")
    conv("conv2", "ConvBlock_1", "Conv_0")
    # nearest+conv upsampling conv SHARED across stages (ndsrgan.py:175-196)
    conv("upsampling.1", "NearestConvUpsample_0", "Conv_0")
    conv("conv3.0", "ConvBlock_2", "Conv_0")
    conv("conv3.2", "ConvBlock_3", "Conv_0")
    return params


def import_amssrn(state: Dict[str, Any], params, n_blocks: int = 8,
                  scale: int = 4):
    """model/amssrn.py GeneratorResNet state_dict -> AMSSRN params."""
    s = _as_np(state)
    params = _copy(params)

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    def prelu(torch_name, *path):
        _set(params, path + ("alpha",),
             s[f"{torch_name}.weight"].reshape(1).astype(np.float32))

    def nonlocal_block(tp, base):
        for i, name in enumerate(("g", "theta", "phi")):
            # ours: Conv_0 = g, Conv_1 = theta, Conv_2 = phi, Conv_3 = W
            pass
        conv(f"{tp}.g", *base, "NonLocalBlock_0", "Conv_0")
        conv(f"{tp}.theta", *base, "NonLocalBlock_0", "Conv_1")
        conv(f"{tp}.phi", *base, "NonLocalBlock_0", "Conv_2")
        conv(f"{tp}.W", *base, "NonLocalBlock_0", "Conv_3")

    def rb(tp, base):
        conv(f"{tp}.conv3X3", *base, "ConvBlock_0", "Conv_0")
        conv(f"{tp}.rb.0", *base, "ConvBlock_1", "Conv_0")
        prelu(f"{tp}.rb.1", *base, "PReLU_0")
        conv(f"{tp}.rb.2", *base, "ConvBlock_2", "Conv_0")

    def calayer(tp, base):
        _set(params, base + ("Dense_0", "kernel"),
             _dense(s[f"{tp}.conv_du.0.weight"]))
        _set(params, base + ("Dense_0", "bias"),
             s[f"{tp}.conv_du.0.bias"].astype(np.float32))
        prelu(f"{tp}.conv_du.1", *(base + ("PReLU_0",)))
        _set(params, base + ("Dense_1", "kernel"),
             _dense(s[f"{tp}.conv_du.2.weight"]))
        _set(params, base + ("Dense_1", "bias"),
             s[f"{tp}.conv_du.2.bias"].astype(np.float32))

    conv("head.0", "ConvBlock_0", "Conv_0")
    _set(params, ("gamma",), s["gamma"].astype(np.float32))
    nonlocal_block("non_local_1.non_local", ("QuadrantNonLocal_0",))
    nonlocal_block("non_local_2.non_local", ("QuadrantNonLocal_1",))
    for i in range(n_blocks):
        tp = f"body.{i}"
        if i < n_blocks // 2:
            base = (f"DB_{i}",)
            for c in range(4):
                rb(f"{tp}.c{c + 1}", base + (f"RB_{c}",))
            calayer(f"{tp}.ca", base + ("AmssrnCALayer_0",))
            conv(f"{tp}.c5", *base, "Conv_0")
        else:
            base = (f"DBASPP_{i - n_blocks // 2}",)
            for c in range(4):
                rb(f"{tp}.c{c + 1}", base + (f"RB_{c}",))
            for d in range(3):
                conv(f"{tp}.aspp.d{d + 1}", *base, f"Conv_{d}")
                prelu(f"{tp}.aspp.act", *base, f"PReLU_{d}")
            calayer(f"{tp}.ca", base + ("AmssrnCALayer_0",))
            conv(f"{tp}.c5", *base, "Conv_3")
    for k in range(n_blocks + 3):
        conv(f"fpn_fusion.fusion.{k}", f"Conv_{k}")
    conv("feature_bank", f"Conv_{n_blocks + 3}")
    stages = (int(math.log2(scale)) if scale & (scale - 1) == 0
              else int(round(math.log(scale, 3))))
    for n in range(stages):
        conv(f"tail.{2 * n}", "UpsampleHead_0", f"Conv_{n}")
    conv("reconstruction", "ConvBlock_1", "Conv_0")
    return params


def import_srgan(state: Dict[str, Any], variables, num_residuals: int = 16,
                 scale: int = 4):
    """model/srgan.py GeneratorResNet state_dict -> SRGAN variables
    (params + batch_stats).

    torch layout: conv1.0 (9x9); res_blocks.{i}.conv_block.{0 conv, 1 bn,
    3 conv, 4 bn}; conv2.{0 conv, 1 bn}; upsampling.{4n conv, 4n+1 bn};
    conv3.0 (9x9).
    """
    s = _as_np(state)
    params = _copy(variables["params"])
    stats = _copy(variables["batch_stats"])

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    def bn(torch_name, *path):
        _set(params, path + ("scale",), s[f"{torch_name}.weight"].astype(
            np.float32))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))
        _set(stats, path + ("mean",), s[f"{torch_name}.running_mean"].astype(
            np.float32))
        _set(stats, path + ("var",), s[f"{torch_name}.running_var"].astype(
            np.float32))

    conv("conv1.0", "ConvBlock_0", "Conv_0")
    for i in range(num_residuals):
        tp = f"res_blocks.{i}.conv_block"
        a, b = 1 + 2 * i, 2 + 2 * i
        conv(f"{tp}.0", f"ConvBlock_{a}", "Conv_0")
        bn(f"{tp}.1", f"ConvBlock_{a}", "BatchNorm_0")
        conv(f"{tp}.3", f"ConvBlock_{b}", "Conv_0")
        bn(f"{tp}.4", f"ConvBlock_{b}", "BatchNorm_0")
    tail_cb = 1 + 2 * num_residuals
    conv("conv2.0", f"ConvBlock_{tail_cb}", "Conv_0")
    bn("conv2.1", f"ConvBlock_{tail_cb}", "BatchNorm_0")
    # upsampling conv/bn SHARED across stages (srgan.py:94-106)
    conv("upsampling.0", "Conv_0")
    bn("upsampling.1", "BatchNorm_0")
    conv("conv3.0", "Conv_1")
    return {"params": params, "batch_stats": stats}


def import_sragan(state: Dict[str, Any], variables, n_groups: int = 12,
                  n_blocks: int = 5, scale: int = 4):
    """model/sragan.py GeneratorResNet state_dict -> SRAGANGenerator
    variables (params + batch_stats)."""
    s = _as_np(state)
    params = _copy(variables["params"])
    stats = _copy(variables["batch_stats"])

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    def bn(torch_name, *path):
        _set(params, path + ("scale",), s[f"{torch_name}.weight"].astype(
            np.float32))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))
        _set(stats, path + ("mean",), s[f"{torch_name}.running_mean"].astype(
            np.float32))
        _set(stats, path + ("var",), s[f"{torch_name}.running_var"].astype(
            np.float32))

    def basic_block(tp, base):
        conv(f"{tp}.conv1.conv", *base, "ConvBlock_0", "Conv_0")
        conv(f"{tp}.conv2.conv", *base, "ConvBlock_1", "Conv_0")
        la = base + ("LocalAttention_0",)
        _set(params, la + ("ChannelGate_0", "Dense_0", "kernel"),
             _dense(s[f"{tp}.ca.fc1.weight"]))
        _set(params, la + ("ChannelGate_0", "Dense_1", "kernel"),
             _dense(s[f"{tp}.ca.fc2.weight"]))
        _set(params, la + ("SpatialGate_0", "Conv_0", "kernel"),
             _k(s[f"{tp}.sa.conv1.weight"]))
        conv(f"{tp}.conv", *la, "Conv_0")

    conv("conv1.0", "Conv_0")
    for g in range(n_groups):
        base = (f"SRAGANGroup_{g}",)
        for b in range(n_blocks - 1):
            basic_block(f"res_blocks.{g}.blocks.{b}",
                        base + (f"BasicAttentionBlock_{b}",))
        basic_block(f"res_blocks.{g}.last_conv",
                    base + (f"BasicAttentionBlock_{n_blocks - 1}",))
        la = base + ("LocalAttention_0",)
        _set(params, la + ("ChannelGate_0", "Dense_0", "kernel"),
             _dense(s[f"res_blocks.{g}.ca.fc1.weight"]))
        _set(params, la + ("ChannelGate_0", "Dense_1", "kernel"),
             _dense(s[f"res_blocks.{g}.ca.fc2.weight"]))
        _set(params, la + ("SpatialGate_0", "Conv_0", "kernel"),
             _k(s[f"res_blocks.{g}.sa.conv1.weight"]))
        conv(f"res_blocks.{g}.conv", *la, "Conv_0")
    conv("conv2.0", "Conv_1")
    bn("conv2.1", "BatchNorm_0")
    ga = ("GlobalAttention_0",)
    _set(params, ga + ("ChannelSelfAttention_0", "gamma"),
         s["ca.gamma"].astype(np.float32))
    for i, name in enumerate(("query_conv", "key_conv", "value_conv")):
        conv(f"sa.{name}", *ga, "SpatialSelfAttention_0", f"Conv_{i}")
    _set(params, ga + ("SpatialSelfAttention_0", "gamma"),
         s["sa.gamma"].astype(np.float32))
    conv("conv", *ga, "Conv_0")
    # upsampling conv/bn SHARED across stages (sragan.py:183-197)
    conv("upsampling.0", "Conv_2")
    bn("upsampling.1", "BatchNorm_1")
    conv("conv3.0", "Conv_3")
    return {"params": params, "batch_stats": stats}


def import_hat(state: Dict[str, Any], params, depths=(6,) * 6,
               scale: int = 4):
    """model/hat.py GeneratorResNet state_dict -> HAT params."""
    s = _as_np(state)
    params = _copy(params)

    def conv(torch_name, *path):
        _set(params, path + ("kernel",), _k(s[f"{torch_name}.weight"]))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    def linear(torch_name, *path):
        _set(params, path + ("kernel",),
             s[f"{torch_name}.weight"].T.astype(np.float32))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    def ln(torch_name, *path):
        _set(params, path + ("scale",), s[f"{torch_name}.weight"].astype(
            np.float32))
        _set(params, path + ("bias",), s[f"{torch_name}.bias"].astype(
            np.float32))

    conv("conv_first", "ConvBlock_0", "Conv_0")
    ln("patch_embed.norm", "LayerNorm_0")
    for i, depth in enumerate(depths):
        rg = f"layers.{i}.residual_group"
        for j in range(depth):
            hb = f"{rg}.blocks.{j}"
            base = (f"RHAG_{i}", f"HAB_{j}")
            ln(f"{hb}.norm1", *base, "LayerNorm_0")
            conv(f"{hb}.conv_block.cab.0", *base, "CAB_0", "ConvBlock_0",
                 "Conv_0")
            conv(f"{hb}.conv_block.cab.2", *base, "CAB_0", "ConvBlock_1",
                 "Conv_0")
            _set(params, base + ("CAB_0", "ChannelAttentionHAT_0", "Dense_0",
                                 "kernel"),
                 _dense(s[f"{hb}.conv_block.cab.3.attention.1.weight"]))
            _set(params, base + ("CAB_0", "ChannelAttentionHAT_0", "Dense_0",
                                 "bias"),
                 s[f"{hb}.conv_block.cab.3.attention.1.bias"].astype(
                     np.float32))
            _set(params, base + ("CAB_0", "ChannelAttentionHAT_0", "Dense_1",
                                 "kernel"),
                 _dense(s[f"{hb}.conv_block.cab.3.attention.3.weight"]))
            _set(params, base + ("CAB_0", "ChannelAttentionHAT_0", "Dense_1",
                                 "bias"),
                 s[f"{hb}.conv_block.cab.3.attention.3.bias"].astype(
                     np.float32))
            wa = base + ("WindowAttention_0",)
            _set(params, wa + ("relative_position_bias_table",),
                 s[f"{hb}.attn.relative_position_bias_table"].astype(
                     np.float32))
            linear(f"{hb}.attn.qkv", *wa, "Dense_0")
            linear(f"{hb}.attn.proj", *wa, "Dense_1")
            ln(f"{hb}.norm2", *base, "LayerNorm_1")
            linear(f"{hb}.mlp.fc1", *base, "Mlp_0", "Dense_0")
            linear(f"{hb}.mlp.fc2", *base, "Mlp_0", "Dense_1")
        oc = f"{rg}.overlap_attn"
        base = (f"RHAG_{i}", "OCAB_0")
        ln(f"{oc}.norm1", *base, "LayerNorm_0")
        linear(f"{oc}.qkv", *base, "Dense_0")
        _set(params, base + ("relative_position_bias_table",),
             s[f"{oc}.relative_position_bias_table"].astype(np.float32))
        linear(f"{oc}.proj", *base, "Dense_1")
        ln(f"{oc}.norm2", *base, "LayerNorm_1")
        linear(f"{oc}.mlp.fc1", *base, "Mlp_0", "Dense_0")
        linear(f"{oc}.mlp.fc2", *base, "Mlp_0", "Dense_1")
        conv(f"layers.{i}.conv", f"RHAG_{i}", "ConvBlock_0", "Conv_0")
    ln("norm", "LayerNorm_1")
    conv("conv_after_body", "ConvBlock_1", "Conv_0")
    conv("conv_before_upsample.0", "ConvBlock_2", "Conv_0")
    # upsample conv SHARED across stages (hat.py:594-615)
    conv("upsample.upsampling.0", "UpsampleHead_0", "Conv_0")
    conv("conv_last", "ConvBlock_3", "Conv_0")
    return params


def import_patch_discriminator(state: Dict[str, Any], variables,
                               attention: bool = True):
    """Reference patch D state_dict -> PatchDiscriminator variables.

    The reference builds the D as one flat nn.Sequential ``model`` whose
    indices depend on the attention inserts (sradsgan.py:470-508 /
    srgan.py:123-155): per block [conv, (bn), lrelu], CBAM gates appended
    after block 6 when attention=True, final 1x1... (3x3) conv.  We walk the
    ordered state_dict keys and assign convs/bns/gates positionally.
    """
    s = _as_np(state)
    params = _copy(variables["params"])
    stats = _copy(variables["batch_stats"])

    conv_i = bn_i = 0
    keys = list(s.keys())
    i = 0
    gates_done = False
    n_convs_total = sum(1 for k in keys
                        if k.endswith("weight") and s[k].ndim == 4
                        and "fc" not in k)
    while i < len(keys):
        k = keys[i]
        if k.endswith("fc1.weight"):  # CBAM channel gate
            _set(params, ("ChannelGate_0", "Dense_0", "kernel"), _dense(s[k]))
            _set(params, ("ChannelGate_0", "Dense_1", "kernel"),
                 _dense(s[keys[i + 1]]))
            i += 2
            gates_done = True
            continue
        if ".sa." in k or k.endswith("conv1.weight") and s[k].shape[1] == 2:
            _set(params, ("SpatialGate_0", "Conv_0", "kernel"), _k(s[k]))
            i += 1
            continue
        if k.endswith("weight") and s[k].ndim == 4:
            name = f"Conv_{conv_i}"
            _set(params, (name, "kernel"), _k(s[k]))
            if i + 1 < len(keys) and keys[i + 1].endswith("bias") and \
                    s[keys[i + 1]].ndim == 1 and (
                        s[keys[i + 1]].shape[0] == s[k].shape[0]):
                _set(params, (name, "bias"), s[keys[i + 1]].astype(
                    np.float32))
                i += 1
            conv_i += 1
            i += 1
            continue
        if k.endswith("weight") and s[k].ndim == 1:  # batchnorm
            name = f"BatchNorm_{bn_i}"
            _set(params, (name, "scale"), s[k].astype(np.float32))
            _set(params, (name, "bias"), s[keys[i + 1]].astype(np.float32))
            _set(stats, (name, "mean"), s[keys[i + 2]].astype(np.float32))
            _set(stats, (name, "var"), s[keys[i + 3]].astype(np.float32))
            bn_i += 1
            i += 4
            # skip num_batches_tracked if present
            if i < len(keys) and keys[i].endswith("num_batches_tracked"):
                i += 1
            continue
        i += 1
    return {"params": params, "batch_stats": stats}


def _copy(params):
    import jax
    return jax.tree.map(np.array, params)
