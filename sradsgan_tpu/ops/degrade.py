"""Batched degradation toolkit: Gaussian blur kernels, noise, SRMD-style
preprocessing.

Reference: model/util.py — ``BatchSRKernel`` (:351) samples per-image
iso/anisotropic Gaussian kernels, ``BatchBlur`` (:383) applies them,
``SRMDPreprocessing`` (:408) chains blur -> bicubic-down -> noise for
blind-SR experiments; data/dataset.py:15-49 adds Gaussian / salt-pepper
image noise.

TPU-native: kernels are generated vectorized from a PRNG key and applied as
one grouped depthwise convolution over the batch — no per-image Python.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from sradsgan_tpu.ops.resize import bicubic_resize


def gaussian_kernels(rng: jax.Array, batch: int, size: int = 21,
                     sigma_min: float = 0.2, sigma_max: float = 4.0,
                     isotropic: bool = True) -> jnp.ndarray:
    """(B, size, size) normalized Gaussian kernels with random sigma
    (reference BatchSRKernel, model/util.py:351-381)."""
    k_sig, k_sig2, k_theta = jax.random.split(rng, 3)
    ax = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    xx, yy = jnp.meshgrid(ax, ax)

    sigma_x = jax.random.uniform(k_sig, (batch,), minval=sigma_min,
                                 maxval=sigma_max)
    if isotropic:
        sigma_y = sigma_x
        theta = jnp.zeros((batch,))
    else:
        sigma_y = jax.random.uniform(k_sig2, (batch,), minval=sigma_min,
                                     maxval=sigma_max)
        theta = jax.random.uniform(k_theta, (batch,), minval=0.0,
                                   maxval=math.pi)

    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    # rotated coordinates per batch element
    xr = cos_t[:, None, None] * xx + sin_t[:, None, None] * yy
    yr = -sin_t[:, None, None] * xx + cos_t[:, None, None] * yy
    k = jnp.exp(-0.5 * ((xr / sigma_x[:, None, None]) ** 2
                        + (yr / sigma_y[:, None, None]) ** 2))
    return k / jnp.sum(k, axis=(1, 2), keepdims=True)


def batch_blur(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-image blur of an NHWC batch with per-image kernels
    (reference BatchBlur, model/util.py:383-406).

    Implemented as a vmap'd depthwise conv — XLA batches it into one
    convolution; reflect padding to keep spatial size.
    """
    size = kernels.shape[-1]
    pad = size // 2

    def one(img, k):
        img = jnp.pad(img, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
        c = img.shape[-1]
        kern = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            img[None], kern, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)[0]

    return jax.vmap(one)(x, kernels)


def add_gaussian_noise(rng: jax.Array, x: jnp.ndarray,
                       sigma: float = 0.01) -> jnp.ndarray:
    """(reference data/dataset.py:15-30)"""
    return jnp.clip(x + sigma * jax.random.normal(rng, x.shape, x.dtype),
                    0.0, 1.0)


def add_poisson_noise(rng: jax.Array, x: jnp.ndarray,
                      vals: float = 256.0) -> jnp.ndarray:
    """Shot noise: clip(Poisson(x * vals) / vals, 0, 1).

    Reference utils/utils.py:897-905 (``poisson_noise``) scales by
    ``vals = 2**ceil(log2(#unique levels))`` — data-dependent and
    host-side; on device the level count of uint8-sourced imagery is a
    static 256, which the reference's formula reduces to for any
    fully-populated 8-bit image.
    """
    lam = jnp.maximum(x.astype(jnp.float32) * vals, 0.0)
    noisy = jax.random.poisson(rng, lam).astype(jnp.float32) / vals
    return jnp.clip(noisy, 0.0, 1.0).astype(x.dtype)


def add_salt_pepper_noise(rng: jax.Array, x: jnp.ndarray,
                          amount: float = 0.01) -> jnp.ndarray:
    """(reference data/dataset.py:32-49)"""
    k1, k2 = jax.random.split(rng)
    u = jax.random.uniform(k1, x.shape[:3] + (1,))
    salt = (u < amount / 2).astype(x.dtype)
    pepper = (u > 1 - amount / 2).astype(x.dtype)
    return jnp.clip(x * (1 - salt - pepper) + salt, 0.0, 1.0)


def srmd_preprocess(rng: jax.Array, hr: jnp.ndarray, scale: int,
                    kernel_size: int = 21, sigma_max: float = 4.0,
                    noise_sigma: float = 0.0,
                    isotropic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Blur -> bicubic down -> noise (reference SRMDPreprocessing,
    model/util.py:408-470).  Returns (lr, kernels)."""
    k_kern, k_noise = jax.random.split(rng)
    kernels = gaussian_kernels(k_kern, hr.shape[0], kernel_size,
                               sigma_max=sigma_max, isotropic=isotropic)
    blurred = batch_blur(hr, kernels)
    h, w = hr.shape[1], hr.shape[2]
    lr = bicubic_resize(blurred, h // scale, w // scale)
    if noise_sigma > 0:
        lr = add_gaussian_noise(k_noise, lr, noise_sigma)
    return jnp.clip(lr, 0.0, 1.0), kernels
