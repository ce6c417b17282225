"""Patch discriminators for the GAN models.

One parametric implementation covers the zoo:

- SRGAN / NDSRGAN style: 8 stacked conv blocks (3x3 or 4x4), stride 1/2
  alternating, BatchNorm except the first, LeakyReLU(0.2), 3x3 conv to a
  1-channel patch logit map (reference srgan.py:123-155, ndsrgan.py:213-238);
- SRADSGAN / SRAGAN style: same trunk with CBAM channel+spatial attention
  inserted after block 6 (reference sradsgan.py:470-508).  (The reference
  also *intends* CAM/PAM after block 8, but its ``if layers == 8`` compares
  a list to an int and never fires — sradsgan.py:496; we reproduce the
  effective network and expose ``use_global_attention`` for the intended
  variant.)
- DRCAN style: base_networks.Discriminator:1747 — same 8-block family.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

from flax import linen as nn

from sradsgan_tpu.nn.norm import BatchNorm

from sradsgan_tpu.nn.attention import (ChannelGate, ChannelSelfAttention,
                                       SpatialGate, SpatialSelfAttention)
from sradsgan_tpu.nn.blocks import default_kernel_init

# (out_filters, stride, normalize) — shared by srgan/sradsgan/sragan Ds.
_DEFAULT_BLOCKS: Tuple[Tuple[int, int, bool], ...] = (
    (64, 1, False), (64, 2, True), (128, 1, True), (128, 2, True),
    (256, 1, True), (256, 2, True), (512, 1, True), (512, 2, True),
)


class VGGStyleDiscriminator(nn.Module):
    """VGG-style discriminator with dense head.

    Reference: model/architecture.py Discriminator_VGG_{96,128,192,256}
    (:87-321): per 2x-downsampling stage a (3x3 s1, 4x4 s2) BN conv pair
    with LeakyReLU(0.2), channels 64->128->256->512->512..., then
    Linear(100) -> LeakyReLU -> Linear(1).  ``input_size`` picks the stage
    count like the four reference variants.
    """

    input_size: int = 128
    base_nf: int = 64
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        import math
        n_stages = int(math.log2(self.input_size // 4))
        nf = self.base_nf
        for i in range(n_stages):
            out_nf = min(nf * (2 ** min(i, 3)), 512)
            x = nn.Conv(out_nf, (3, 3), padding="SAME", use_bias=i == 0,
                        kernel_init=default_kernel_init, dtype=self.dtype)(x)
            if i > 0:
                x = BatchNorm(
                         use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Conv(out_nf, (4, 4), strides=(2, 2), padding="SAME",
                        use_bias=False, kernel_init=default_kernel_init,
                        dtype=self.dtype)(x)
            x = BatchNorm(
                         use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(100, kernel_init=default_kernel_init,
                     dtype=self.dtype)(x)
        x = nn.leaky_relu(x, 0.2)
        return nn.Dense(1, kernel_init=default_kernel_init,
                        dtype=self.dtype)(x)


class SNPatchDiscriminator(nn.Module):
    """Spectrally-normalized patch D (reference spectral_norm.py usage in
    base_networks.Discriminator(use_spectralnorm=True):1747)."""

    blocks: Sequence[Tuple[int, int, bool]] = _DEFAULT_BLOCKS
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from sradsgan_tpu.nn.spectral_norm import SNConv
        for filters, stride, _ in self.blocks:
            x = SNConv(filters, 3, stride, dtype=self.dtype)(
                x, update_stats=train)
            x = nn.leaky_relu(x, 0.2)
        return nn.Conv(1, (3, 3), padding="SAME",
                       kernel_init=default_kernel_init, dtype=self.dtype)(x)


class PatchDiscriminator(nn.Module):
    blocks: Sequence[Tuple[int, int, bool]] = _DEFAULT_BLOCKS
    kernel_size: int = 3
    use_attention: bool = False       # CBAM gates after block 6
    use_global_attention: bool = False  # CAM/PAM after block 8 (intended-only)
    dtype: Optional[Any] = None
    # BatchNorm always computes in f32 unless overridden: under WGAN weight
    # clipping the BN scales collapse to +-clip and the bf16 backward
    # through the normalization chain overflows (docs/VALIDATION.md).
    norm_dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.kernel_size
        # torch-style symmetric padding (k-1)//2: for stride-2 convs this
        # differs from XLA "SAME" (which pads (0,1)) — required for parity
        # with the reference's Conv2d(k, stride, padding=1) blocks.
        pad = (k - 1) // 2
        for i, (filters, stride, normalize) in enumerate(self.blocks, 1):
            x = nn.Conv(filters, (k, k), strides=(stride, stride),
                        padding=((pad, pad), (pad, pad)),
                        kernel_init=default_kernel_init,
                        dtype=self.dtype)(x)
            if normalize:
                x = BatchNorm(
                         use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, dtype=self.norm_dtype)(x)
                x = x.astype(self.dtype or x.dtype)
            x = nn.leaky_relu(x, 0.2)
            if self.use_attention and i == 6:
                x = ChannelGate(ratio=16, dtype=self.dtype)(x)
                x = SpatialGate(dtype=self.dtype)(x)
            if self.use_global_attention and i == 8:
                x = ChannelSelfAttention(dtype=self.dtype)(x)
                x = SpatialSelfAttention(dtype=self.dtype)(x)
        return nn.Conv(1, (3, 3), padding="SAME",
                       kernel_init=default_kernel_init, dtype=self.dtype)(x)
