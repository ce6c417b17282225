"""Spectral normalization for discriminator convs.

Reference: model/spectral_norm.py (power-iteration ``SpectralNorm``:10,
``spectral_norm()``:80), used by optional D variants
(base_networks.Discriminator(use_spectralnorm=True):1747).

Flax-native: wraps any conv/dense via ``nn.SpectralNorm``-style power
iteration kept in a mutable ``spectral`` collection; one iteration per step
(the reference default).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sradsgan_tpu.nn.blocks import default_kernel_init


class SNConv(nn.Module):
    """Conv with spectral weight normalization (power iteration)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    n_iter: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, update_stats: bool = True):
        in_ch = x.shape[-1]
        k = self.kernel_size
        kernel = self.param("kernel", default_kernel_init,
                            (k, k, in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        w = kernel.reshape(-1, self.features)

        u_var = self.variable("spectral", "u",
                              lambda: jax.random.normal(
                                  jax.random.PRNGKey(0), (self.features,)))
        u = u_var.value
        for _ in range(self.n_iter):
            v = w @ u
            v = v / (jnp.linalg.norm(v) + 1e-12)
            u = w.T @ v
            u = u / (jnp.linalg.norm(u) + 1e-12)
        sigma = v @ (w @ u)
        if update_stats and not self.is_initializing():
            u_var.value = jax.lax.stop_gradient(u)
        w_sn = (kernel / jax.lax.stop_gradient(sigma)).astype(
            self.dtype or kernel.dtype)

        return jax.lax.conv_general_dilated(
            x.astype(w_sn.dtype), w_sn, (self.stride, self.stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(
                w_sn.dtype)
