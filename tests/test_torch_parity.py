"""Cross-framework parity tests against torch (CPU) as oracle.

The image bundles torch (CPU-only); these tests check that our GAN loss /
gradient-penalty math matches what the reference's torch code computes on
identical inputs — the strongest available evidence short of running the
reference itself (its CUDA deps aren't installed).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sradsgan_tpu.losses.gan import (adversarial_loss_d, adversarial_loss_g,
                                     gradient_penalty)  # noqa: E402

rng = np.random.default_rng(7)


def _torch_gan_loss(logits, target_is_real, gan_type):
    """Reference GANLoss semantics (model/sradsgan.py:35-67)."""
    t = torch.from_numpy(logits)
    if gan_type == "vanilla":
        label = torch.full_like(t, 1.0 if target_is_real else 0.0)
        return torch.nn.BCEWithLogitsLoss()(t, label).item()
    if gan_type == "lsgan":
        label = torch.full_like(t, 1.0 if target_is_real else 0.0)
        return torch.nn.MSELoss()(t, label).item()
    # wgan-gp
    return (-t.mean() if target_is_real else t.mean()).item()


@pytest.mark.parametrize("gan_type", ["vanilla", "lsgan", "wgan-gp"])
def test_g_loss_matches_torch(gan_type):
    logits = rng.normal(0, 2, (4, 6, 6, 1)).astype(np.float32)
    ours = float(adversarial_loss_g(jnp.asarray(logits), gan_type))
    ref = _torch_gan_loss(logits, True, gan_type)
    assert ours == pytest.approx(ref, abs=1e-5)


@pytest.mark.parametrize("gan_type", ["vanilla", "lsgan", "wgan-gp"])
def test_d_loss_matches_torch(gan_type):
    real = rng.normal(0, 2, (4, 6, 6, 1)).astype(np.float32)
    fake = rng.normal(0, 2, (4, 6, 6, 1)).astype(np.float32)
    ours = float(adversarial_loss_d(jnp.asarray(real), jnp.asarray(fake),
                                    gan_type))
    l_r = _torch_gan_loss(real, True, gan_type)
    l_f = _torch_gan_loss(fake, False, gan_type)
    ref = 0.5 * (l_r + l_f) if gan_type == "lsgan" else l_r + l_f
    assert ours == pytest.approx(ref, abs=1e-5)


def test_gradient_penalty_matches_torch():
    """Replicates the reference gradient_penalty (sradsgan.py:595-641) with
    a fixed linear 'discriminator' and a fixed interpolation alpha."""
    c_out, c_in = 1, 3
    w = rng.normal(0, 0.5, (c_in, c_out)).astype(np.float32)
    real = rng.random((2, 5, 5, c_in)).astype(np.float32)
    fake = rng.random((2, 5, 5, c_in)).astype(np.float32)
    alpha = rng.random((2, 1, 1, 1)).astype(np.float32)

    # ---- ours (fix alpha by monkeypatching uniform) ----
    import sradsgan_tpu.losses.gan as gan_mod
    d_fn = lambda x: jnp.einsum("bhwc,co->bhwo", x, jnp.asarray(w))
    orig_uniform = jax.random.uniform
    try:
        jax.random.uniform = lambda *a, **k: jnp.asarray(alpha)
        ours = float(gradient_penalty(d_fn, jnp.asarray(real),
                                      jnp.asarray(fake),
                                      jax.random.PRNGKey(0)))
    finally:
        jax.random.uniform = orig_uniform

    # ---- torch reference (NCHW; grad norm over dim 1 = channels) ----
    tw = torch.from_numpy(w)
    treal = torch.from_numpy(real.transpose(0, 3, 1, 2))
    tfake = torch.from_numpy(fake.transpose(0, 3, 1, 2))
    talpha = torch.from_numpy(alpha.transpose(0, 3, 1, 2))
    interp = (talpha * treal + (1 - talpha) * tfake).requires_grad_(True)

    def torch_d(x):  # same linear map on channels
        return torch.einsum("bchw,co->bohw", x, tw)

    out = torch_d(interp)
    grads = torch.autograd.grad(out, interp,
                                grad_outputs=torch.ones_like(out),
                                create_graph=True)[0]
    grad_norm = grads.norm(2, 1)  # channel-dim norm (reference quirk)
    ref = ((grad_norm - 1) ** 2).mean().item()

    assert ours == pytest.approx(ref, rel=1e-4)


def test_pixel_shuffle_matches_torch():
    from sradsgan_tpu.ops.pixelshuffle import pixel_shuffle
    x = rng.random((2, 4, 4, 16)).astype(np.float32)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x), 2))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.pixel_shuffle(tx, 2).numpy().transpose(
        0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-7)
