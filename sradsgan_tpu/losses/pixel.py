"""Pixel reconstruction losses (reference: L1Loss/MSELoss per
``--loss_Lp_norm``, main_sradsgan.py:56, sradsgan.py:685-689)."""

from __future__ import annotations

import jax.numpy as jnp


def pixel_loss(pred: jnp.ndarray, target: jnp.ndarray,
               kind: str = "l1") -> jnp.ndarray:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    if kind == "l1":
        return jnp.mean(jnp.abs(diff))
    if kind == "l2":
        return jnp.mean(diff * diff)
    raise ValueError(f"unknown pixel loss {kind!r}")
