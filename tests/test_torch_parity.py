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


# ---------------------------------------------------------------------------
# Full training-step parity: one WGAN-GP step through the REAL Trainer vs a
# line-by-line torch replication of the reference step
# (model/sradsgan.py:826-892 + gradient_penalty :595-641): Adam bias
# correction, BatchNorm batch/running-stat semantics (incl. torch's unbiased
# running_var), the shared D(sr) forward, the train-mode GP, the inner
# gp.backward() (effective GP weight 1+lambda), and the +-0.01 weight clip.
# ---------------------------------------------------------------------------

def _flax_conv_to_torch(tconv, params):
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(
            np.asarray(params["kernel"]).transpose(3, 2, 0, 1)))
        if "bias" in params:
            tconv.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))


def _flax_bn_to_torch(tbn, params):
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(np.asarray(params["scale"])))
        tbn.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))


class _TorchTinyG(torch.nn.Module):
    def __init__(self, features=8, scale=2):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, features, 3, padding=1)
        self.conv2 = torch.nn.Conv2d(features, 3 * scale * scale, 3,
                                     padding=1)
        self.scale = scale

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        return torch.nn.functional.pixel_shuffle(self.conv2(x), self.scale)


class _TorchTinyD(torch.nn.Module):
    """Twin of PatchDiscriminator(blocks=((4,1,F),(4,2,T),(8,2,T)))."""

    def __init__(self):
        super().__init__()
        self.c1 = torch.nn.Conv2d(3, 4, 3, 1, 1)
        self.c2 = torch.nn.Conv2d(4, 4, 3, 2, 1)
        self.b2 = torch.nn.BatchNorm2d(4, eps=1e-5, momentum=0.1)
        self.c3 = torch.nn.Conv2d(4, 8, 3, 2, 1)
        self.b3 = torch.nn.BatchNorm2d(8, eps=1e-5, momentum=0.1)
        self.out = torch.nn.Conv2d(8, 1, 3, 1, 1)

    def forward(self, x):
        a = torch.nn.functional.leaky_relu
        x = a(self.c1(x), 0.2)
        x = a(self.b2(self.c2(x)), 0.2)
        x = a(self.b3(self.c3(x)), 0.2)
        return self.out(x)


def _torch_reference_step(G, D, opt_g, opt_d, lr_img, hr_img, alpha,
                          w_gan=1e-3, lambda_gp=10.0, clip=0.01):
    """The reference train step, torch, NCHW (sradsgan.py:826-892)."""
    l1 = torch.nn.L1Loss()
    # ---- G step ----
    opt_g.zero_grad()
    gen_hr = G(lr_img)
    pixel = l1(gen_hr, hr_img)
    loss_gan = -D(gen_hr).mean()                    # stats update 1 (sr)
    loss_G = pixel + w_gan * loss_gan
    loss_G.backward()
    opt_g.step()
    # ---- D step ----
    opt_d.zero_grad()
    loss_real = -D(hr_img).mean()                   # stats update 2 (hr)
    loss_fake = D(gen_hr.detach()).mean()           # stats update 3 (sr)
    loss_D = loss_real + loss_fake
    interp = (alpha * hr_img + (1 - alpha) * gen_hr.detach()
              ).requires_grad_(True)
    d_i = D(interp)                                 # stats update 4 (interp)
    grads = torch.autograd.grad(d_i, interp, torch.ones_like(d_i),
                                create_graph=True, retain_graph=True)[0]
    gp = ((grads.norm(2, 1) - 1) ** 2).mean()
    gp.backward(retain_graph=True)                  # inner backward (:639)
    loss_D = loss_D + lambda_gp * gp
    loss_D.backward()
    opt_d.step()
    for p in D.parameters():                        # weight clip (:890-892)
        p.data.clamp_(-clip, clip)
    return float(loss_G), float(loss_D)


def test_full_train_step_matches_torch(monkeypatch, tmp_path):
    from flax import linen as nn

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.models import ModelSpec, register
    from sradsgan_tpu.models.discriminators import PatchDiscriminator
    from sradsgan_tpu.nn.blocks import default_kernel_init
    from sradsgan_tpu.ops.pixelshuffle import pixel_shuffle
    from sradsgan_tpu.train.trainer import Trainer

    class TinyG(nn.Module):
        scale: int = 2
        features: int = 8
        dtype: object = None

        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        kernel_init=default_kernel_init)(x)
            x = nn.relu(x)
            x = nn.Conv(3 * self.scale ** 2, (3, 3), padding="SAME",
                        kernel_init=default_kernel_init)(x)
            return pixel_shuffle(x, self.scale)

    blocks = ((4, 1, False), (4, 2, True), (8, 2, True))
    register(ModelSpec(
        "tinygan", TinyG, adversarial=True, gan_type="wgan-gp",
        discriminator=lambda **kw: PatchDiscriminator(blocks=blocks, **kw),
        pixel_loss="l1", weight_content=0.0, weight_gan=1e-3))

    cfg = config_for_model("tinygan", 2)
    cfg.bf16 = False
    cfg.data.synthetic = True
    cfg.data.crop_size = 16
    cfg.data.batch_size = 8
    cfg.save_dir = str(tmp_path)
    trainer = Trainer(cfg)

    # ---- identical weights in torch ----
    gp_np = jax.tree.map(np.asarray, trainer.state.g_params)
    dp_np = jax.tree.map(np.asarray, trainer.state.d_params)
    G = _TorchTinyG()
    D = _TorchTinyD()
    _flax_conv_to_torch(G.conv1, gp_np["Conv_0"])
    _flax_conv_to_torch(G.conv2, gp_np["Conv_1"])
    _flax_conv_to_torch(D.c1, dp_np["Conv_0"])
    _flax_conv_to_torch(D.c2, dp_np["Conv_1"])
    _flax_bn_to_torch(D.b2, dp_np["BatchNorm_0"])
    _flax_conv_to_torch(D.c3, dp_np["Conv_2"])
    _flax_bn_to_torch(D.b3, dp_np["BatchNorm_1"])
    _flax_conv_to_torch(D.out, dp_np["Conv_3"])
    G.train(), D.train()
    opt_g = torch.optim.Adam(G.parameters(), lr=cfg.optim.lr,
                             betas=(0.9, 0.999))
    opt_d = torch.optim.Adam(D.parameters(), lr=cfg.optim.lr,
                             betas=(0.9, 0.999))

    # ---- two steps on fixed batches with a fixed GP alpha ----
    data_rng = np.random.default_rng(3)
    alpha_np = data_rng.random((8, 1, 1, 1)).astype(np.float32)
    monkeypatch.setattr(jax.random, "uniform",
                        lambda *a, **k: jnp.asarray(alpha_np))
    losses_ours, losses_ref = [], []
    for step in range(2):
        lr_img = data_rng.random((8, 8, 8, 3)).astype(np.float32)
        hr_img = data_rng.random((8, 16, 16, 3)).astype(np.float32)
        batch = {"lr": jnp.asarray(lr_img), "hr": jnp.asarray(hr_img)}
        trainer.state, metrics = trainer._jit_step(trainer.state, batch,
                                                   jax.random.PRNGKey(step))
        losses_ours.append((float(metrics["loss_G"]),
                            float(metrics["loss_D"])))
        t_lr = torch.from_numpy(lr_img.transpose(0, 3, 1, 2))
        t_hr = torch.from_numpy(hr_img.transpose(0, 3, 1, 2))
        t_alpha = torch.from_numpy(alpha_np)
        losses_ref.append(_torch_reference_step(
            G, D, opt_g, opt_d, t_lr, t_hr, t_alpha,
            w_gan=cfg.gan.weight_gan, lambda_gp=cfg.gan.lambda_gp,
            clip=cfg.gan.clip_value))

    for (og, od), (rg, rd) in zip(losses_ours, losses_ref):
        assert og == pytest.approx(rg, rel=1e-4, abs=1e-5)
        assert od == pytest.approx(rd, rel=1e-4, abs=1e-4)

    # ---- parameters and BN running stats after two full steps ----
    gp2 = jax.tree.map(np.asarray, trainer.state.g_params)
    dp2 = jax.tree.map(np.asarray, trainer.state.d_params)
    ds2 = jax.tree.map(np.asarray, trainer.state.d_stats)

    def close(ours, theirs, name, atol=5e-5, rtol=1e-3):
        np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=atol,
                                   rtol=rtol, err_msg=name)

    close(gp2["Conv_0"]["kernel"].transpose(3, 2, 0, 1), G.conv1.weight,
          "G conv1")
    close(gp2["Conv_1"]["kernel"].transpose(3, 2, 0, 1), G.conv2.weight,
          "G conv2")
    close(gp2["Conv_0"]["bias"], G.conv1.bias, "G conv1 bias")
    close(dp2["Conv_0"]["kernel"].transpose(3, 2, 0, 1), D.c1.weight,
          "D c1")
    close(dp2["Conv_1"]["kernel"].transpose(3, 2, 0, 1), D.c2.weight,
          "D c2")
    close(dp2["Conv_3"]["kernel"].transpose(3, 2, 0, 1), D.out.weight,
          "D out")
    close(dp2["BatchNorm_0"]["scale"], D.b2.weight, "D bn2 scale")
    close(dp2["BatchNorm_1"]["scale"], D.b3.weight, "D bn3 scale")
    # Running MEANS are near-zero channel averages (values ~1e-4) whose
    # f32 conv-noise floor is ~1e-5/step — compare with an absolute
    # tolerance; variances are O(1) and compare tightly.
    close(ds2["BatchNorm_0"]["mean"], D.b2.running_mean, "D bn2 rmean",
          atol=3e-4)
    close(ds2["BatchNorm_0"]["var"], D.b2.running_var, "D bn2 rvar")
    close(ds2["BatchNorm_1"]["mean"], D.b3.running_mean, "D bn3 rmean",
          atol=3e-4)
    close(ds2["BatchNorm_1"]["var"], D.b3.running_var, "D bn3 rvar")
