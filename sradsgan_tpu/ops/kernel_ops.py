"""KernelGAN-style estimated-kernel post-processing.

Reference: model/util.py:1124-1346 — centralize an estimated degradation
kernel on its center of mass, zeroize negligible entries, normalize to unit
sum, and shave/pad to a target size; used when training with estimated
(blind-SR) kernels.
"""

from __future__ import annotations

import numpy as np

from scipy.ndimage import measurements, shift as nd_shift


def zeroize_negligible(kernel: np.ndarray, n_keep: int = 40) -> np.ndarray:
    """Keep the n_keep largest taps, zero the rest, renormalize
    (util.py:1196-1210 style)."""
    k = np.asarray(kernel, np.float64).copy()
    flat = np.sort(k.ravel())[::-1]
    cutoff = flat[min(n_keep, flat.size - 1)]
    k[k < cutoff] = 0.0
    s = k.sum()
    return (k / s) if s > 0 else k


def centralize_kernel(kernel: np.ndarray) -> np.ndarray:
    """Shift the kernel so its center of mass is the geometric center
    (util.py:1124-1170 style)."""
    k = np.asarray(kernel, np.float64)
    cy, cx = measurements.center_of_mass(k)
    size = k.shape[0]
    center = (size - 1) / 2.0
    return nd_shift(k, (center - cy, center - cx), order=1, mode="constant")


def post_process_kernel(kernel: np.ndarray, n_keep: int = 40,
                        target_size: int | None = None) -> np.ndarray:
    """Full pipeline: centralize -> zeroize -> renormalize -> resize."""
    k = centralize_kernel(kernel)
    k = zeroize_negligible(k, n_keep)
    if target_size is not None and target_size != k.shape[0]:
        size = k.shape[0]
        if target_size < size:
            off = (size - target_size) // 2
            k = k[off:off + target_size, off:off + target_size]
        else:
            pad = (target_size - size) // 2
            k = np.pad(k, ((pad, target_size - size - pad),) * 2)
    s = k.sum()
    return k / s if s > 0 else k
