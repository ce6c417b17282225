"""Auxiliary losses from the reference's loss library.

Reference: model/loss.py — ``DownScaleLoss``:29 (SR downscaled back should
match the LR input), ``CentralizedLoss``:69 / ``BoundariesLoss``:89 /
``SparsityLoss``:105 (KernelGAN-style kernel regularizers), contrastive
losses :173-296.  Mostly latent in the reference mains but part of the
public loss surface.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from sradsgan_tpu.ops.resize import bicubic_resize


def downscale_loss(sr: jnp.ndarray, lr: jnp.ndarray,
                   scale: int) -> jnp.ndarray:
    """MSE between bicubic-downscaled SR and the LR input (loss.py:29-67)."""
    h, w = lr.shape[1], lr.shape[2]
    down = bicubic_resize(sr, h, w)
    return jnp.mean((down.astype(jnp.float32)
                     - lr.astype(jnp.float32)) ** 2)


def centralized_loss(kernel: jnp.ndarray) -> jnp.ndarray:
    """Penalize kernel center-of-mass offset (loss.py:69-87)."""
    k = kernel / (jnp.sum(kernel, axis=(-2, -1), keepdims=True) + 1e-12)
    size = kernel.shape[-1]
    ax = jnp.arange(size, dtype=jnp.float32)
    center = (size - 1) / 2.0
    cy = jnp.sum(k * ax[None, :, None], axis=(-2, -1))
    cx = jnp.sum(k * ax[None, None, :], axis=(-2, -1))
    return jnp.mean((cy - center) ** 2 + (cx - center) ** 2)


def boundaries_loss(kernel: jnp.ndarray, border: int = 2) -> jnp.ndarray:
    """Penalize kernel mass on the border (loss.py:89-103)."""
    size = kernel.shape[-1]
    mask = np.ones((size, size), np.float32)
    mask[border:size - border, border:size - border] = 0.0
    return jnp.mean(jnp.abs(kernel) * jnp.asarray(mask))


def sparsity_loss(kernel: jnp.ndarray, power: float = 0.2) -> jnp.ndarray:
    """Encourage sparse kernels via |k|^p (loss.py:105-119)."""
    return jnp.mean(jnp.abs(kernel) ** power)


def sum_to_one_loss(kernel: jnp.ndarray) -> jnp.ndarray:
    """Kernel mass should sum to 1 (KernelGAN constraint set)."""
    return jnp.mean((jnp.sum(kernel, axis=(-2, -1)) - 1.0) ** 2)


def contrastive_loss(anchor_feats: jnp.ndarray, pos_feats: jnp.ndarray,
                     neg_feats: jnp.ndarray,
                     eps: float = 1e-7) -> jnp.ndarray:
    """L1-ratio contrastive loss: pull anchor to positive, push from
    negative in feature space (loss.py:173-296 family)."""
    d_pos = jnp.mean(jnp.abs(anchor_feats - pos_feats), axis=tuple(
        range(1, anchor_feats.ndim)))
    d_neg = jnp.mean(jnp.abs(anchor_feats - neg_feats), axis=tuple(
        range(1, anchor_feats.ndim)))
    return jnp.mean(d_pos / (d_neg + eps))
