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


def show_attention_on_image(image01: np.ndarray, mask01: np.ndarray,
                            path: str) -> None:
    """Jet-heatmap attention overlay (reference utils/utils.py:156-167).

    ``attention = (jet(mask) + image) / max(...)`` exactly as the reference
    computes it (additive blend then global renormalize), with matplotlib's
    jet colormap standing in for ``cv2.applyColorMap(COLORMAP_JET)``.

    image01: (H, W, 3) float in [0, 1]; mask01: (H, W) float in [0, 1].
    """
    from matplotlib import cm

    mask8 = np.uint8(255 * np.asarray(mask01, np.float32))
    heatmap = cm.jet(mask8 / 255.0)[..., :3].astype(np.float32)
    attention = heatmap + np.asarray(image01, np.float32)
    attention = attention / max(float(attention.max()), 1e-8)
    save_image(attention, path)


def make_gif(frame_paths: Sequence[str], out_path: str,
             fps: float = 5.0) -> None:
    """Epoch-result animation (reference utils/utils.py:87-95, make_gif).

    The reference globs per-epoch result PNGs and writes a 5-fps gif via
    imageio; here the caller passes the frame paths and PIL writes the gif
    (imageio is not in this image).
    """
    from PIL import Image

    frames = [Image.open(p).convert("P", palette=Image.ADAPTIVE)
              for p in frame_paths]
    if not frames:
        return
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    frames[0].save(out_path, save_all=True, append_images=frames[1:],
                   duration=int(1000 / fps), loop=0)
