"""Device-side bicubic resize with PIL semantics, as dense matmuls.

The reference's entire metric protocol hangs off PIL's antialiased bicubic
resize: LR inputs are ``PIL.Image.resize(..., BICUBIC)`` downsamples of the
HR crop and the "bicubic" baseline is the LR re-upsampled the same way
(reference: data/dataset.py:428-436).  PSNR parity therefore requires an
implementation of PIL's resample — cubic kernel a=-0.5, filter support
scaled by the downsampling factor (antialiasing), per-row weight
normalization.

PIL's resample is separable, and the per-output-pixel weights depend only on
(in_size, out_size).  On TPU the natural formulation is two dense matmuls:

    out[b, oh, ow, c] = Wh[oh, ih] * img[b, ih, iw, c] * Ww[ow, iw]

which XLA maps straight onto the MXU and fuses with neighbors — no gathers,
no dynamic shapes.  Weight matrices are built host-side in float64 and cached
per (in, out) pair.

The host pipeline still uses PIL itself for dataset generation (bit-parity by
construction); this op serves on-device throughput paths (train-time
degradation, diffusion conditioning, benchmark mode) and is tested against
PIL to < 1e-3 mean absolute error in [0, 1] space (tests/test_resize.py).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


def _cubic(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    """PIL's bicubic kernel (Catmull-Rom family, a = -0.5)."""
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    inner = (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0
    outer = a * ax3 - 5.0 * a * ax2 + 8.0 * a * ax - 4.0 * a
    return np.where(ax < 1.0, inner, np.where(ax < 2.0, outer, 0.0))


def _linear(x: np.ndarray) -> np.ndarray:
    """PIL's bilinear (triangle) kernel, support 1."""
    ax = np.abs(x)
    return np.where(ax < 1.0, 1.0 - ax, 0.0)


_FILTERS = {"bicubic": (_cubic, 2.0), "bilinear": (_linear, 1.0)}


@functools.lru_cache(maxsize=256)
def resize_matrix(in_size: int, out_size: int,
                  method: str = "bicubic") -> np.ndarray:
    """Dense (out_size, in_size) PIL resampling matrix, float32.

    Mirrors PIL's ``precompute_coeffs``: output pixel centers at
    (i + 0.5) * in/out, support widened by the scale factor when
    downsampling, weights normalized to sum to one.  ``method`` is
    'bicubic' or 'bilinear' (the reference uses bilinear for test-time LR:
    torchvision ``Resize`` default in data/data.py:330).
    """
    kernel, base_support = _FILTERS[method]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = base_support * filterscale
    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        xs = np.arange(xmin, xmax, dtype=np.float64)
        weights = kernel((xs - center + 0.5) / filterscale)
        total = weights.sum()
        if total != 0.0:
            weights = weights / total
        w[i, xmin:xmax] = weights
    return w.astype(np.float32)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _resize_impl(x: jnp.ndarray, out_h: int, out_w: int,
                 method: str = "bicubic") -> jnp.ndarray:
    in_h, in_w = x.shape[1], x.shape[2]
    wh = jnp.asarray(resize_matrix(in_h, out_h, method))
    ww = jnp.asarray(resize_matrix(in_w, out_w, method))
    # Horizontal pass first (PIL order); two MXU matmuls.
    x = jnp.einsum("ow,bhwc->bhoc", ww, x, precision=jax.lax.Precision.HIGHEST)
    x = jnp.einsum("oh,bhwc->bowc", wh, x, precision=jax.lax.Precision.HIGHEST)
    return x


def bicubic_resize(x: jnp.ndarray, out_h: int, out_w: int,
                   method: str = "bicubic") -> jnp.ndarray:
    """Resize an NHWC (or HWC) float batch with PIL resize semantics."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    out = _resize_impl(x, out_h, out_w, method)
    return out[0] if squeeze else out


def degrade_pair(hr: jnp.ndarray, scale: int, lr_method: str = "bicubic"):
    """HR batch -> (LR, bicubic-upsampled-LR), the reference's data triplet.

    Reference: data/dataset.py:428-436 builds (lr, hr, bc) with PIL bicubic
    down and LR->HR re-up at train time; at test time the LR downsample is
    bilinear (torchvision Resize default, data/data.py:330) while the twin
    re-up stays bicubic.  Output LR is clipped to [0, 1] before re-upsampling
    to mirror the uint8 PIL intermediate.
    """
    h, w = hr.shape[-3], hr.shape[-2]
    lr = jnp.clip(bicubic_resize(hr, h // scale, w // scale, lr_method),
                  0.0, 1.0)
    bc = bicubic_resize(lr, h, w, "bicubic")
    return lr, bc
