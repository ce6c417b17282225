"""GAN losses: vanilla / lsgan / wgan-gp, plus the reference's gradient
penalty variants and relativistic option.

Reference semantics (model/sradsgan.py:35-67 GANLoss; :571-641 penalties;
:826-892 train-step composition):

- vanilla: BCE-with-logits against 1/0 targets;
- lsgan: MSE against 1/0 targets;
- wgan-gp: ``-mean(D(x))`` for real targets, ``mean(D(x))`` for fake;
- gradient penalty: d/dx of sum(D(interp)) where interp = a*real+(1-a)*fake,
  norm taken over the CHANNEL axis per spatial position (the reference's
  ``gradients.norm(p, 1)`` on NCHW keeps H,W — a quirk we reproduce), then
  'LS' (norm-1)^2 or 'hinge' relu(norm-1), meaned;
- relativistic average GAN option (``--relativeGan``, sradsgan.py:841-848).

In JAX the double-backward of the reference (``gradient_penalty.backward``
inside the D step) collapses to a plain ``jax.grad`` through ``jax.grad`` —
both live inside the single jitted train step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax


def _bce_logits(logits: jnp.ndarray, target: float) -> jnp.ndarray:
    labels = jnp.full_like(logits, target)
    return jnp.mean(optax.sigmoid_binary_cross_entropy(logits, labels))


def _gan_loss(logits: jnp.ndarray, target_is_real: bool,
              gan_type: str) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    if gan_type == "vanilla":
        return _bce_logits(logits, 1.0 if target_is_real else 0.0)
    if gan_type == "lsgan":
        t = 1.0 if target_is_real else 0.0
        return jnp.mean((logits - t) ** 2)
    if gan_type == "wgan-gp":
        m = jnp.mean(logits)
        return -m if target_is_real else m
    raise ValueError(f"unknown gan type {gan_type!r}")


def adversarial_loss_g(fake_logits: jnp.ndarray, gan_type: str,
                       real_logits: jnp.ndarray | None = None,
                       relativistic: bool = False) -> jnp.ndarray:
    """Generator adversarial loss (reference sradsgan.py:840-848)."""
    if relativistic:
        assert real_logits is not None
        real = jax.lax.stop_gradient(real_logits)
        return 0.5 * (
            _gan_loss(real - jnp.mean(fake_logits), False, gan_type)
            + _gan_loss(fake_logits - jnp.mean(real), True, gan_type))
    return _gan_loss(fake_logits, True, gan_type)


def adversarial_loss_d(real_logits: jnp.ndarray, fake_logits: jnp.ndarray,
                       gan_type: str,
                       relativistic: bool = False) -> jnp.ndarray:
    """Discriminator loss (reference sradsgan.py:868-878).

    lsgan trainers average the two terms (srgan.py:686); vanilla/wgan sum.
    """
    if relativistic:
        l_real = _gan_loss(real_logits - jnp.mean(fake_logits), True,
                           gan_type)
        l_fake = _gan_loss(fake_logits - jnp.mean(real_logits), False,
                           gan_type)
        return 0.5 * (l_real + l_fake)
    l_real = _gan_loss(real_logits, True, gan_type)
    l_fake = _gan_loss(fake_logits, False, gan_type)
    if gan_type == "lsgan":
        return 0.5 * (l_real + l_fake)
    return l_real + l_fake


def gradient_penalty(d_fn: Callable, real: jnp.ndarray, fake: jnp.ndarray,
                     rng: jax.Array, lp_norm: str = "l2",
                     penalty_type: str = "ls", with_stats: bool = False):
    """WGAN gradient penalty on random interpolates (sradsgan.py:595-641).

    The reference evaluates D(interp) with the module in train mode (the
    whole net is inside ``net.train()``), so its BatchNorm layers normalize
    by the interpolate batch's own statistics AND update the running stats.
    With ``with_stats=True``, ``d_fn`` must return ``(logits, new_stats)``
    and this function returns ``(gp, new_stats)`` so the trainer can thread
    the running-stat update like torch does.
    """
    b = real.shape[0]
    alpha = jax.random.uniform(rng, (b, 1, 1, 1), dtype=real.dtype)
    interp = alpha * real + (1.0 - alpha) * fake

    if with_stats:
        def inner(x):
            logits, stats = d_fn(x)
            return jnp.sum(logits.astype(jnp.float32)), stats

        grads, stats = jax.grad(inner, has_aux=True)(interp)
    else:
        grads = jax.grad(
            lambda x: jnp.sum(d_fn(x).astype(jnp.float32)))(interp)
    grads = grads.astype(jnp.float32)
    # Channel-axis norm per position (reference .norm(p, 1) on NCHW).
    if lp_norm == "linf":
        norm = jnp.max(jnp.abs(grads), axis=-1)
    elif lp_norm == "l1":
        norm = jnp.sum(jnp.abs(grads), axis=-1)
    else:
        norm = jnp.sqrt(jnp.sum(grads * grads, axis=-1) + 1e-12)
    if penalty_type == "hinge":
        constraint = jax.nn.relu(norm - 1.0)
    else:  # 'ls'
        constraint = (norm - 1.0) ** 2
    gp = jnp.mean(constraint)
    return (gp, stats) if with_stats else gp
