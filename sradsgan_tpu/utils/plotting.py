"""Result-panel plotting (reference utils/utils.py:190-687).

Side-by-side HR / LR / bicubic / SR panels annotated with MSE/PSNR/SSIM/
ERGAS/LPIPS, plus training-curve plots (utils/utils.py:55-86 plot_loss).
Matplotlib with the Agg backend — host-side only, never in the jit path.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def save_image(img01: np.ndarray, path: str) -> None:
    """Save a float [0,1] HWC image as png (reference save_img1,
    utils/utils.py:169)."""
    from PIL import Image
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def plot_test_panel(images: Sequence[np.ndarray], labels: Sequence[str],
                    metrics: Optional[Sequence[Optional[Dict[str, float]]]],
                    path: str) -> None:
    """HR/LR/bicubic/SR comparison panel (utils/utils.py:252 style)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = len(images)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4.6))
    if n == 1:
        axes = [axes]
    for ax, img, label, m in zip(axes, images, labels,
                                 metrics or [None] * n):
        ax.imshow(np.clip(img, 0, 1))
        ax.set_axis_off()
        title = label
        if m:
            title += "\n" + " ".join(f"{k}:{v:.3f}" for k, v in m.items())
        ax.set_title(title, fontsize=9)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_chain_grid(chain01: np.ndarray, path: str) -> None:
    """Reverse-diffusion snapshot grid for one image (reference
    sr_mfe.py:305-319 'grid' sr_img_mode, the ``_sr_process`` dump).

    chain01: (n_snapshots, H, W, C) in [0, 1], noise -> clean order."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n = chain01.shape[0]
    fig, axes = plt.subplots(1, n, figsize=(2.2 * n, 2.5))
    if n == 1:
        axes = [axes]
    for i, ax in enumerate(np.atleast_1d(axes)):
        ax.imshow(np.clip(chain01[i], 0, 1))
        ax.set_axis_off()
        ax.set_title("final" if i == n - 1 else f"t{i}", fontsize=8)
    fig.tight_layout()
    fig.savefig(path, dpi=100)
    plt.close(fig)


def plot_curves(history: Dict[str, Sequence[float]], path: str) -> None:
    """Loss/metric training curves (utils/utils.py:55-86)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keys = [k for k, v in history.items() if len(v)]
    if not keys:
        return
    fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3.2))
    if len(keys) == 1:
        axes = [axes]
    for ax, k in zip(axes, keys):
        ax.plot(history[k])
        ax.set_title(k, fontsize=10)
        ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
