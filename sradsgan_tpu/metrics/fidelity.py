"""Image-fidelity metrics reproducing the reference evaluation protocol.

The reference (Meng-333/SRADSGAN) scores SR outputs with old-skimage
`compare_mse` / `compare_psnr` / `compare_ssim(multichannel=True)` on uint8
arrays obtained from a `ToPILImage()` round-trip, plus a local ERGAS variant
(reference: model/sradsgan.py:1484-1496, utils/utils.py:954-962).  skimage is
not a dependency here; these are independent implementations of the exact same
math, validated in tests/test_metrics.py against hand-computed values.

Two tiers:

* numpy tier (`compare_*`): protocol-exact, float64, uint8 inputs — used by
  the evaluation entry points that must match the published tables.
* jax tier (`batched_*`): jitted, batched, NHWC float inputs — used for fast
  on-device validation during training (runs the same formulas after an
  emulated uint8 quantization so numbers line up with the numpy tier).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# uint8 round-trip
# ---------------------------------------------------------------------------

def tensor_to_uint8(x) -> np.ndarray:
    """Float image in [0, 1] -> uint8, matching torchvision ``ToPILImage``.

    The reference converts CHW float tensors with ``ToPILImage()`` before
    computing metrics (model/sradsgan.py:1476-1483); torchvision implements
    that as ``pic.mul(255).byte()`` — i.e. truncation.  We additionally clip
    to [0, 1] first (the reference relies on in-range outputs; clipping is
    the well-defined extension for out-of-range SR pixels).

    Accepts HWC or CHW numpy/jax arrays; returns HWC uint8.
    """
    x = np.asarray(x)
    if x.ndim == 3 and x.shape[0] in (1, 3) and x.shape[-1] not in (1, 3):
        x = np.transpose(x, (1, 2, 0))  # CHW -> HWC
    x = np.clip(x.astype(np.float32), 0.0, 1.0)
    return (x * 255.0).astype(np.uint8)


# ---------------------------------------------------------------------------
# numpy tier — protocol-exact
# ---------------------------------------------------------------------------

def compare_mse(im1: np.ndarray, im2: np.ndarray) -> float:
    """Mean squared error in float64 (skimage ``compare_mse`` semantics)."""
    im1 = np.asarray(im1, dtype=np.float64)
    im2 = np.asarray(im2, dtype=np.float64)
    return float(np.mean((im1 - im2) ** 2))


def compare_psnr(im_true: np.ndarray, im_test: np.ndarray,
                 data_range: float | None = None) -> float:
    """PSNR in dB (skimage ``compare_psnr`` semantics).

    ``data_range`` defaults to 255 for uint8 inputs, 1.0 for floats — the
    reference always passes uint8 (model/sradsgan.py:924).
    """
    if data_range is None:
        data_range = 255.0 if np.asarray(im_true).dtype == np.uint8 else 1.0
    err = compare_mse(im_true, im_test)
    if err == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / err))


def _ssim_single_channel(x: np.ndarray, y: np.ndarray, data_range: float,
                         win_size: int = 7, k1: float = 0.01,
                         k2: float = 0.03) -> float:
    """Single-channel SSIM with skimage defaults.

    Uniform (not gaussian) window, sample covariance normalization
    NP/(NP-1), and a (win-1)//2 border crop — the defaults behind the
    reference's ``compare_ssim(gen, hr, multichannel=True)`` calls
    (model/sradsgan.py:925).
    """
    from scipy.ndimage import uniform_filter

    x = x.astype(np.float64)
    y = y.astype(np.float64)
    npix = win_size ** 2
    cov_norm = npix / (npix - 1.0)  # sample covariance

    filt = lambda a: uniform_filter(a, size=win_size)
    ux, uy = filt(x), filt(y)
    uxx, uyy, uxy = filt(x * x), filt(y * y), filt(x * y)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    a1, a2 = 2.0 * ux * uy + c1, 2.0 * vxy + c2
    b1, b2 = ux ** 2 + uy ** 2 + c1, vx + vy + c2
    s = (a1 * a2) / (b1 * b2)

    pad = (win_size - 1) // 2
    return float(s[pad:s.shape[0] - pad, pad:s.shape[1] - pad].mean())


def compare_ssim(im1: np.ndarray, im2: np.ndarray,
                 data_range: float | None = None,
                 multichannel: bool = True, win_size: int = 7) -> float:
    """Mean structural similarity (skimage ``compare_ssim`` semantics)."""
    im1 = np.asarray(im1)
    im2 = np.asarray(im2)
    if data_range is None:
        data_range = 255.0 if im1.dtype == np.uint8 else 1.0
    if multichannel and im1.ndim == 3:
        vals = [_ssim_single_channel(im1[..., c], im2[..., c], data_range,
                                     win_size=win_size)
                for c in range(im1.shape[-1])]
        return float(np.mean(vals))
    return _ssim_single_channel(im1, im2, data_range, win_size=win_size)


def compare_ergas(img_true: np.ndarray, img_test: np.ndarray,
                  scale: int = 4) -> float:
    """ERGAS, reference variant ``compare_ergas2`` (utils/utils.py:954-962).

    ``100 * sqrt(mse / mean(img_true)^2 / channels) / scale`` with the MSE
    taken over all channels jointly and the mean over the ground truth —
    the reference calls it as ``compare_ergas2(gt_img, recon_img, scale)``.
    """
    img_true = np.asarray(img_true, dtype=np.float64)
    img_test = np.asarray(img_test, dtype=np.float64)
    channels = img_true.shape[2]
    mse = np.mean((img_true - img_test) ** 2)
    mean2 = np.mean(img_true) ** 2
    return float(100.0 * np.sqrt(mse / mean2 / channels) / scale)


# ---------------------------------------------------------------------------
# jax tier — batched, jitted, NHWC
# ---------------------------------------------------------------------------

def _quantize01(x: jnp.ndarray) -> jnp.ndarray:
    """Emulate the uint8 round-trip on device: clip, scale, truncate."""
    return jnp.floor(jnp.clip(x, 0.0, 1.0) * 255.0)


@jax.jit
def batched_psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR over an NHWC batch, after emulated uint8 quantization.

    Matches ``compare_psnr`` on the corresponding uint8 arrays up to the
    float32-vs-float64 accumulation difference (tested to < 1e-3 dB).
    """
    p = _quantize01(pred)
    t = _quantize01(target)
    mse = jnp.mean((p - t) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10((255.0 ** 2) / jnp.maximum(mse, 1e-12))


@jax.jit
def batched_ergas(pred: jnp.ndarray, target: jnp.ndarray,
                  scale: int = 4) -> jnp.ndarray:
    """Per-image ERGAS variant-2 over an NHWC batch (uint8-emulated),
    matching ``compare_ergas`` (utils/utils.py:954)."""
    p = _quantize01(pred)
    t = _quantize01(target)
    c = t.shape[-1]
    mse = jnp.mean((p - t) ** 2, axis=(1, 2, 3))
    mean2 = jnp.mean(t, axis=(1, 2, 3)) ** 2
    return 100.0 * jnp.sqrt(mse / jnp.maximum(mean2, 1e-12) / c) / scale


def _uniform_filter_nhwc(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Depthwise uniform (box) filter, VALID padding, NHWC."""
    c = x.shape[-1]
    kernel = jnp.full((win, win, 1, 1), 1.0 / (win * win), dtype=x.dtype)
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)  # metric: no bf16 downcast


@jax.jit
def batched_ssim(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-image SSIM over an NHWC batch with the reference protocol.

    Uniform 7x7 window, sample covariance, data_range 255 after emulated
    uint8 quantization, channel-averaged — same math as ``compare_ssim``.
    VALID convolution replaces filter-then-crop; both only ever see in-bounds
    pixels, so results agree.

    Float32-safe: the moment filters run on globally mean-centered, [0, 1]-
    scaled data (variances are shift-invariant; the luminance term adds the
    mean back), which kills the ``E[x^2] - E[x]^2`` cancellation that costs
    ~5e-4 of SSIM when filtering raw 0..255 values in float32.
    """
    win = 7
    x = _quantize01(pred) / 255.0
    y = _quantize01(target) / 255.0
    npix = win * win
    cov_norm = npix / (npix - 1.0)

    m = 0.5 * (jnp.mean(x, axis=(1, 2, 3), keepdims=True)
               + jnp.mean(y, axis=(1, 2, 3), keepdims=True))
    xc, yc = x - m, y - m

    uxc = _uniform_filter_nhwc(xc, win)
    uyc = _uniform_filter_nhwc(yc, win)
    uxx = _uniform_filter_nhwc(xc * xc, win)
    uyy = _uniform_filter_nhwc(yc * yc, win)
    uxy = _uniform_filter_nhwc(xc * yc, win)
    vx = cov_norm * (uxx - uxc * uxc)
    vy = cov_norm * (uyy - uyc * uyc)
    vxy = cov_norm * (uxy - uxc * uyc)
    ux, uy = uxc + m, uyc + m

    c1 = 0.01 ** 2  # data_range folded out: SSIM(s*x, s*y, s*L) = SSIM(x, y, L)
    c2 = 0.03 ** 2
    s = ((2.0 * ux * uy + c1) * (2.0 * vxy + c2)) / (
        (ux ** 2 + uy ** 2 + c1) * (vx + vy + c2))
    return jnp.mean(s, axis=(1, 2, 3))
