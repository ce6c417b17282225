"""Shared Flax building blocks for the SR model zoo.

One block library serves all nine generators (the reference instead repeats
these per model file — e.g. ConvBlock/ResnetBlock in model/base_networks.py:
170-300, upsample heads cloned in every model).  Everything is NHWC, static-
shaped, and jit-friendly; convs default to normal(0.02) init to match the
reference's ``weights_init_normal`` (model/sradsgan.py:69-87).

Naming/semantics notes for checkpoint parity:
- torch ``nn.LeakyReLU()`` default slope is 0.01; the reference uses 0.2
  only where written explicitly ('lrelu' in its block factories).
- ``UpsampleHead`` implements the shared scale law: scale 2^n -> n stages of
  (3x3 conv to 4C, PixelShuffle x2), scale 3^n -> n stages of (conv to 9C,
  PixelShuffle x3) (reference: model/sradsgan.py:380-394, edsr.py:41-58).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.norm import BatchNorm

from sradsgan_tpu.ops.pixelshuffle import pixel_shuffle

Dtype = Any

default_kernel_init = nn.initializers.normal(stddev=0.02)


def make_act(name: Optional[str]) -> Optional[Callable]:
    """Activation factory mirroring the reference block factories."""
    if name is None or name == "":
        return None
    table = {
        "relu": nn.relu,
        "lrelu": lambda x: nn.leaky_relu(x, 0.2),
        "lrelu01": lambda x: nn.leaky_relu(x, 0.01),
        # Real learned PReLU (torch default: one slope, init 0.25).  The
        # lambda instantiates the module lazily so it binds as a child of
        # whatever compact module calls the returned activation.
        "prelu": lambda x: PReLU()(x),
        "tanh": nn.tanh,
        "sigmoid": nn.sigmoid,
        "gelu": nn.gelu,
    }
    if name not in table:
        raise ValueError(f"unknown activation {name!r}")
    return table[name]


class ConvBlock(nn.Module):
    """3x3-by-default conv + optional norm + optional activation.

    Reference: base_networks.py:170-208.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    activation: Optional[str] = None
    norm: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel_size, self.kernel_size),
                    strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding="SAME", use_bias=self.use_bias,
                    kernel_init=default_kernel_init, dtype=self.dtype)(x)
        if self.norm == "batch":
            x = BatchNorm(
                         use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        elif self.norm == "instance":
            x = nn.GroupNorm(num_groups=x.shape[-1], dtype=self.dtype)(x)
        act = make_act(self.activation)
        if act is not None:
            x = act(x)
        return x


class PReLU(nn.Module):
    """Channel-shared PReLU (torch default: one learned slope, init 0.25)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (1,),
                           jnp.float32)
        alpha = alpha.astype(x.dtype)
        return jnp.where(x >= 0, x, alpha * x)


class ResBlock(nn.Module):
    """conv-act-conv (+ optional norms) with identity skip.

    Covers EDSR (no norm, ReLU — base_networks.py:246-298) and SRGAN's
    BN variant (srgan.py:72-121) via flags.  ``res_scale`` kept for models
    that damp the residual branch.
    """

    features: int
    kernel_size: int = 3
    activation: str = "relu"
    norm: Optional[str] = None
    res_scale: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = ConvBlock(self.features, self.kernel_size,
                      activation=self.activation, norm=self.norm,
                      dtype=self.dtype)(x, train)
        y = ConvBlock(self.features, self.kernel_size, activation=None,
                      norm=self.norm, dtype=self.dtype)(y, train)
        if self.res_scale != 1.0:
            y = y * self.res_scale
        return residual + y


class UpsampleHead(nn.Module):
    """Sub-pixel upsample tail: 2^n and 3^n scale law.

    Per stage: 3x3 conv expanding channels by r^2, PixelShuffle(r), then an
    optional activation (the reference uses LeakyReLU(0.01) here).
    Scales 2, 4, 8 -> r=2 stages; 3, 9 -> r=3 stages.

    ``share_stages``: most reference models build their stage list ONCE and
    append it repeatedly (``upsampling += upsampling_two``), so the SAME
    conv module is applied at every stage — shared weights (e.g.
    sradsgan.py:380-394, edsr.py:41-58, hat.py:594-615).  DRCAN and AMSSRN
    construct fresh convs per stage instead (drcan Upsampler,
    amssrn.py:74-91).  Set accordingly for param-count/checkpoint parity.
    """

    features: int
    scale: int
    activation: Optional[str] = "lrelu01"
    share_stages: bool = False
    dtype: Optional[Dtype] = None

    @staticmethod
    def stages(scale: int) -> Sequence[int]:
        if scale & (scale - 1) == 0:  # power of two
            return [2] * int(math.log2(scale))
        if scale % 3 == 0:
            return [3] * int(round(math.log(scale, 3)))
        raise ValueError(f"unsupported scale {scale}")

    @nn.compact
    def __call__(self, x):
        import os
        act = make_act(self.activation)
        stages = self.stages(self.scale)
        # SRADSGAN_TPU_UPSAMPLE_IMPL=convt folds conv+PixelShuffle into one
        # transposed conv (ops/pixelshuffle.subpixel_conv_transposed) — the
        # param tree is IDENTICAL (Conv_N/kernel+bias in nn.Conv layout) so
        # checkpoints swap freely between formulations.
        convt = os.environ.get("SRADSGAN_TPU_UPSAMPLE_IMPL", "") == "convt"
        shared_conv = None
        if self.share_stages and stages:
            r0 = stages[0]
            shared_conv = (_SubpixelParams(self.features, r0, name="Conv_0")
                           if convt else
                           nn.Conv(self.features * r0 * r0, (3, 3),
                                   padding="SAME",
                                   kernel_init=default_kernel_init,
                                   dtype=self.dtype))
        for i, r in enumerate(stages):
            if convt:
                holder = (shared_conv if shared_conv is not None else
                          _SubpixelParams(self.features, r, name=f"Conv_{i}"))
                kernel, bias = holder()
                from sradsgan_tpu.ops.pixelshuffle import \
                    subpixel_conv_transposed
                x = subpixel_conv_transposed(x, kernel, bias, r)
            else:
                conv = shared_conv if shared_conv is not None else nn.Conv(
                    self.features * r * r, (3, 3), padding="SAME",
                    kernel_init=default_kernel_init, dtype=self.dtype)
                x = conv(x)
                x = pixel_shuffle(x, r)
            if act is not None:
                x = act(x)
        return x


class _SubpixelParams(nn.Module):
    """nn.Conv-compatible kernel+bias holder for the transposed-conv
    sub-pixel path (same param names/shapes as ``nn.Conv(f*r*r, (3, 3))``)."""

    features: int
    r: int

    @nn.compact
    def __call__(self):
        crr = self.features * self.r * self.r
        kernel = self.param("kernel", default_kernel_init,
                            (3, 3, self.features, crr))
        bias = self.param("bias", nn.initializers.zeros, (crr,))
        return kernel, bias


class DeconvBlock(nn.Module):
    """Transposed-conv upsampling block (base_networks.py:211-244)."""

    features: int
    kernel_size: int = 4
    stride: int = 2
    activation: Optional[str] = "relu"
    norm: Optional[str] = "batch"
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.ConvTranspose(self.features,
                             (self.kernel_size, self.kernel_size),
                             strides=(self.stride, self.stride),
                             padding="SAME",
                             kernel_init=default_kernel_init,
                             dtype=self.dtype)(x)
        if self.norm == "batch":
            x = BatchNorm(
                         use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        act = make_act(self.activation)
        return act(x) if act is not None else x


class Upsample2xBlock(nn.Module):
    """2x upsampling: 'deconv' | 'ps' (sub-pixel) | 'rnc' (resize+conv)
    (base_networks.py:336-365)."""

    features: int
    upsample: str = "deconv"
    activation: Optional[str] = "relu"
    norm: Optional[str] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.upsample == "deconv":
            return DeconvBlock(self.features, 4, 2, self.activation,
                               self.norm, dtype=self.dtype)(x, train)
        if self.upsample == "ps":
            x = nn.Conv(self.features * 4, (3, 3), padding="SAME",
                        kernel_init=default_kernel_init, dtype=self.dtype)(x)
            x = pixel_shuffle(x, 2)
        elif self.upsample == "rnc":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_init=default_kernel_init, dtype=self.dtype)(x)
        else:
            raise ValueError(f"unknown upsample mode {self.upsample!r}")
        if self.norm == "batch":
            x = BatchNorm(
                         use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
        act = make_act(self.activation)
        return act(x) if act is not None else x


class NearestConvUpsample(nn.Module):
    """Nearest-neighbor x2 + conv upsampling (NDSRGAN's head,
    reference ndsrgan.py:175-196; stage modules shared like the sub-pixel
    heads — the reference appends one list repeatedly)."""

    features: int
    scale: int
    activation: Optional[str] = "lrelu"
    share_stages: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x):
        act = make_act(self.activation)
        shared = nn.Conv(self.features, (3, 3), padding="SAME",
                         kernel_init=default_kernel_init,
                         dtype=self.dtype) if self.share_stages else None
        for r in UpsampleHead.stages(self.scale):
            x = jnp.repeat(jnp.repeat(x, r, axis=1), r, axis=2)
            conv = shared if shared is not None else nn.Conv(
                self.features, (3, 3), padding="SAME",
                kernel_init=default_kernel_init, dtype=self.dtype)
            x = conv(x)
            if act is not None:
                x = act(x)
        return x
