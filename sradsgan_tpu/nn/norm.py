"""torch-exact BatchNorm for training-step parity.

flax's ``nn.BatchNorm`` updates the running variance with the BIASED batch
variance; torch's ``BatchNorm2d`` normalizes with the biased variance but
updates ``running_var`` with the UNBIASED one (Bessel-corrected,
``n/(n-1)``).  The reference trains every BN discriminator with torch
semantics (e.g. model/srgan.py:123-155, sradsgan.py:470-508), and PSNR
parity after N epochs rides on the running stats used at eval — so this
module reproduces torch exactly:

- train: normalize by biased batch mean/var; ``running <- (1-m_t)*running +
  m_t*batch`` with torch momentum ``m_t`` (flax convention: ``momentum``
  here is ``1 - m_t``, matching the 0.9 used across this repo);
  running_var takes the unbiased variance;
- eval: normalize by the running stats.

Stats and normalization always compute in float32 (bf16-safe; see
docs/VALIDATION.md on WGAN-clipped BN discriminators); the output is cast
to ``dtype`` (or the input dtype).  Param/collection names match
``nn.BatchNorm`` (class name, ``scale``/``bias``, ``batch_stats``
``mean``/``var``) so checkpoints and the reference weight importer are
unaffected by the swap.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Optional[Any] = None
    use_scale: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))
        if ura:
            mean, var = ra_mean.value, ra_var.value
        else:
            mean = jnp.mean(xf, axis=axes)
            var = jnp.mean(jnp.square(xf - mean), axis=axes)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.use_scale:
            y = y * self.param("scale", nn.initializers.ones, (feat,),
                               jnp.float32)
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (feat,),
                               jnp.float32)
        return y.astype(self.dtype or x.dtype)
