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

    # ---- TEN consecutive steps on fixed batches with a fixed GP alpha:
    # Adam moment accumulation, BN running-stat drift and the weight-clip
    # interaction must track the reference over a trajectory, not just one
    # step (reference hot loop sradsgan.py:826-892) ----
    data_rng = np.random.default_rng(3)
    alpha_np = data_rng.random((8, 1, 1, 1)).astype(np.float32)
    monkeypatch.setattr(jax.random, "uniform",
                        lambda *a, **k: jnp.asarray(alpha_np))
    losses_ours, losses_ref = [], []
    for step in range(10):
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
        assert og == pytest.approx(rg, rel=5e-4, abs=1e-4)
        assert od == pytest.approx(rd, rel=5e-4, abs=5e-4)

    # ---- parameters and BN running stats after ten full steps ----
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
    # Running MEANS are near-zero channel EMAs: a ~1e-5 absolute weight
    # difference (the f32 conv-noise floor, amplified by Adam sign steps on
    # near-zero gradients) propagates to ~1e-3 in these aggregates across
    # the 40 BN updates of a 10-step trajectory — compare with an absolute
    # tolerance scaled accordingly; variances are O(1) and compare tightly.
    close(ds2["BatchNorm_0"]["mean"], D.b2.running_mean, "D bn2 rmean",
          atol=3e-3)
    close(ds2["BatchNorm_0"]["var"], D.b2.running_var, "D bn2 rvar",
          rtol=5e-3)
    close(ds2["BatchNorm_1"]["mean"], D.b3.running_mean, "D bn3 rmean",
          atol=3e-3)
    close(ds2["BatchNorm_1"]["var"], D.b3.running_var, "D bn3 rvar",
          rtol=5e-3)


# ---------------------------------------------------------------------------
# Flagship-modules trajectory oracle: the REAL SRADSGAN generator blocks
# (MSB stem, RAB wide-conv pair + CLAM/SLAM local attention, group skip,
# CGAM/SGAM global attention, shared sub-pixel upsample) and a CBAM-bearing
# patch discriminator, run through the real Trainer for 10 consecutive
# WGAN-GP steps against a line-by-line torch replication
# (reference model/sradsgan.py:101-275, 326-468, 826-892).  This proves the
# spatial-gate custom VJP (first-order in G, grad-of-grad through the D's
# CBAM in the gradient penalty) and the shared-D(sr) gradient algebra over a
# trajectory, not just in isolation.
# ---------------------------------------------------------------------------

class _TorchChannelGate(torch.nn.Module):
    """CLAM / CBAM channel gate: sigmoid(MLP(avg) + MLP(max)) * x."""

    def __init__(self, c, ratio=16):
        super().__init__()
        hidden = max(c // ratio, 1)
        self.fc1 = torch.nn.Linear(c, hidden, bias=False)
        self.fc2 = torch.nn.Linear(hidden, c, bias=False)

    def forward(self, x):  # NCHW
        avg = x.mean(dim=(2, 3))
        mx = x.amax(dim=(2, 3))
        mlp = lambda v: self.fc2(torch.relu(self.fc1(v)))
        return torch.sigmoid(mlp(avg) + mlp(mx))[:, :, None, None] * x


class _TorchSpatialGate(torch.nn.Module):
    """SLAM / CBAM spatial gate: sigmoid(conv7x7([mean_c; max_c])) * x."""

    def __init__(self, k=7):
        super().__init__()
        self.conv = torch.nn.Conv2d(2, 1, k, padding=k // 2, bias=False)

    def forward(self, x):
        stats = torch.cat([x.mean(dim=1, keepdim=True),
                           x.amax(dim=1, keepdim=True)], dim=1)
        return torch.sigmoid(self.conv(stats)) * x


class _TorchLocalAttention(torch.nn.Module):
    """'CA-SA' + 1x1 fuse conv (reference sradsgan.py:242-275)."""

    def __init__(self, c):
        super().__init__()
        self.ca = _TorchChannelGate(c)
        self.sa = _TorchSpatialGate()
        self.fuse = torch.nn.Conv2d(c, c, 1)

    def forward(self, x):
        return self.fuse(self.sa(self.ca(x)))


class _TorchCGAM(torch.nn.Module):
    """Gram-matrix channel self-attention with max-subtraction
    (sradsgan.py:178-213)."""

    def __init__(self):
        super().__init__()
        self.gamma = torch.nn.Parameter(torch.zeros(1))

    def forward(self, x):
        b, c, h, w = x.shape
        flat = x.reshape(b, c, h * w)                     # (b, c, n)
        energy = torch.bmm(flat, flat.transpose(1, 2))    # (b, c, c)
        energy_new = energy.amax(dim=-1, keepdim=True) - energy
        attn = torch.softmax(energy_new, dim=-1)
        out = torch.bmm(attn, flat).reshape(b, c, h, w)
        return self.gamma * out + x


class _TorchSGAM(torch.nn.Module):
    """Position self-attention with zero-init gain (sradsgan.py:153-176)."""

    def __init__(self, c):
        super().__init__()
        inner = max(c // 8, 1)
        self.q = torch.nn.Conv2d(c, inner, 1)
        self.k = torch.nn.Conv2d(c, inner, 1)
        self.v = torch.nn.Conv2d(c, c, 1)
        self.gamma = torch.nn.Parameter(torch.zeros(1))

    def forward(self, x):
        b, c, h, w = x.shape
        q = self.q(x).reshape(b, -1, h * w).transpose(1, 2)   # (b, n, d)
        k = self.k(x).reshape(b, -1, h * w).transpose(1, 2)
        v = self.v(x).reshape(b, c, h * w).transpose(1, 2)    # (b, n, c)
        energy = torch.bmm(q, k.transpose(1, 2))              # (b, n, n)
        attn = torch.softmax(energy, dim=-1)
        out = torch.bmm(attn, v).transpose(1, 2).reshape(b, c, h, w)
        return self.gamma * out + x


class _TorchMSB(torch.nn.Module):
    """Multi-scale stem (sradsgan.py:326-345)."""

    def __init__(self, c_in, f):
        super().__init__()
        self.c0 = torch.nn.Conv2d(c_in, f, 3, padding=1)
        self.c1 = torch.nn.Conv2d(c_in, f, 1)
        self.c2 = torch.nn.Conv2d(f, f, 3, padding=1)
        self.c3 = torch.nn.Conv2d(c_in, f, 1)
        self.c4 = torch.nn.Conv2d(3 * f, f, 1)

    def forward(self, x):
        out = torch.cat([self.c0(x), self.c2(self.c1(x)), self.c3(x)], 1)
        return torch.nn.functional.leaky_relu(self.c4(out), 0.01)


class _TorchRAB(torch.nn.Module):
    """Wide conv pair + CLAM/SLAM, residual (sradsgan.py:215-275)."""

    def __init__(self, f, expand=4):
        super().__init__()
        self.c0 = torch.nn.Conv2d(f, expand * f, 3, padding=1)
        self.c1 = torch.nn.Conv2d(expand * f, f, 3, padding=1)
        self.la = _TorchLocalAttention(f)

    def forward(self, x):
        out = torch.nn.functional.leaky_relu(self.c0(x), 0.2)
        return self.la(self.c1(out)) + x


class _TorchFlagshipG(torch.nn.Module):
    """SRADSGANGenerator(n_groups=1, n_blocks=1) twin, NCHW."""

    def __init__(self, f=16, scale=2):
        super().__init__()
        self.msb = _TorchMSB(3, f)
        self.head = torch.nn.Conv2d(3, f, 3, padding=1)
        self.rab = _TorchRAB(f)
        self.group_la = _TorchLocalAttention(f)
        self.cgam = _TorchCGAM()
        self.sgam = _TorchSGAM(f)
        self.ga_fuse = torch.nn.Conv2d(f, f, 1)
        self.up = torch.nn.Conv2d(f, f * scale * scale, 3, padding=1)
        self.out = torch.nn.Conv2d(f, 3, 3, padding=1)
        self.scale = scale

    def forward(self, x):
        msb = self.msb(x)
        out = torch.nn.functional.leaky_relu(self.head(x), 0.01)
        out_all = msb + out
        g = self.group_la(self.rab(out)) + out          # one ResGroup
        out_all = out_all + g
        out_all = self.ga_fuse(self.sgam(self.cgam(out_all)))
        out_all = torch.nn.functional.pixel_shuffle(self.up(out_all),
                                                    self.scale)
        out_all = torch.nn.functional.leaky_relu(out_all, 0.01)
        return self.out(out_all)


class _TorchCBAMPatchD(torch.nn.Module):
    """PatchDiscriminator(blocks=6, use_attention=True) twin: CBAM gates
    after block 6 sit INSIDE the gradient-penalty grad-of-grad."""

    def __init__(self, blocks):
        super().__init__()
        convs, bns = [], []
        c_in = 3
        for filters, stride, norm in blocks:
            convs.append(torch.nn.Conv2d(c_in, filters, 3, stride, 1))
            bns.append(torch.nn.BatchNorm2d(filters, eps=1e-5, momentum=0.1)
                       if norm else None)
            c_in = filters
        self.convs = torch.nn.ModuleList(convs)
        self.bns = torch.nn.ModuleList(
            [b if b is not None else torch.nn.Identity() for b in bns])
        self.has_bn = [b is not None for b in bns]
        self.ca = _TorchChannelGate(c_in)
        self.sa = _TorchSpatialGate()
        self.out = torch.nn.Conv2d(c_in, 1, 3, padding=1)

    def forward(self, x):
        for i, conv in enumerate(self.convs):
            x = conv(x)
            if self.has_bn[i]:
                x = self.bns[i](x)
            x = torch.nn.functional.leaky_relu(x, 0.2)
            if i == len(self.convs) - 1:                  # block 6: CBAM
                x = self.sa(self.ca(x))
        return self.out(x)


def _copy_dense(tlin, params):
    with torch.no_grad():
        tlin.weight.copy_(torch.from_numpy(
            np.asarray(params["kernel"]).T))


def _copy_local_attention(tla, params):
    _copy_dense(tla.ca.fc1, params["ChannelGate_0"]["Dense_0"])
    _copy_dense(tla.ca.fc2, params["ChannelGate_0"]["Dense_1"])
    with torch.no_grad():
        tla.sa.conv.weight.copy_(torch.from_numpy(np.asarray(
            params["SpatialGate_0"]["Conv_0"]["kernel"]).transpose(
                3, 2, 0, 1)))
    _flax_conv_to_torch(tla.fuse, params["Conv_0"])


def test_flagship_modules_trajectory_matches_torch(monkeypatch, tmp_path):
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.models import ModelSpec, register
    from sradsgan_tpu.models.discriminators import PatchDiscriminator
    from sradsgan_tpu.models.sradsgan import SRADSGANGenerator
    from sradsgan_tpu.train.trainer import Trainer

    d_blocks = ((4, 1, False), (4, 2, True), (8, 1, True), (8, 2, True),
                (8, 1, True), (8, 1, True))
    register(ModelSpec(
        "tinysrads", SRADSGANGenerator, adversarial=True,
        gan_type="wgan-gp",
        discriminator=lambda **kw: PatchDiscriminator(
            blocks=d_blocks, use_attention=True, **kw),
        pixel_loss="l1", weight_content=0.0, weight_gan=1e-3))

    cfg = config_for_model("tinysrads", 2)
    cfg.bf16 = False
    cfg.data.synthetic = True
    cfg.data.crop_size = 16
    cfg.data.batch_size = 4
    cfg.model_kwargs = dict(base_filters=16, n_groups=1, n_blocks=1)
    cfg.save_dir = str(tmp_path)
    trainer = Trainer(cfg)

    gp_np = jax.tree.map(np.asarray, trainer.state.g_params)
    dp_np = jax.tree.map(np.asarray, trainer.state.d_params)

    G = _TorchFlagshipG()
    msb = gp_np["MSB_0"]
    for i, t in enumerate([G.msb.c0, G.msb.c1, G.msb.c2, G.msb.c3,
                           G.msb.c4]):
        _flax_conv_to_torch(t, msb[f"Conv_{i}"])
    _flax_conv_to_torch(G.head, gp_np["Conv_0"])
    rab = gp_np["ResGroup_0"]["RAB_0"]
    _flax_conv_to_torch(G.rab.c0, rab["Conv_0"])
    _flax_conv_to_torch(G.rab.c1, rab["Conv_1"])
    _copy_local_attention(G.rab.la, rab["LocalAttention_0"])
    _copy_local_attention(G.group_la, gp_np["ResGroup_0"]["LocalAttention_0"])
    ga = gp_np["GlobalAttention_0"]
    with torch.no_grad():
        G.cgam.gamma.copy_(torch.from_numpy(np.asarray(
            ga["ChannelSelfAttention_0"]["gamma"])))
        G.sgam.gamma.copy_(torch.from_numpy(np.asarray(
            ga["SpatialSelfAttention_0"]["gamma"])))
    sg = ga["SpatialSelfAttention_0"]
    _flax_conv_to_torch(G.sgam.q, sg["Conv_0"])
    _flax_conv_to_torch(G.sgam.k, sg["Conv_1"])
    _flax_conv_to_torch(G.sgam.v, sg["Conv_2"])
    _flax_conv_to_torch(G.ga_fuse, ga["Conv_0"])
    _flax_conv_to_torch(G.up, gp_np["UpsampleHead_0"]["Conv_0"])
    _flax_conv_to_torch(G.out, gp_np["ConvBlock_0"]["Conv_0"])

    D = _TorchCBAMPatchD(d_blocks)
    bn_i = 0
    for i in range(6):
        _flax_conv_to_torch(D.convs[i], dp_np[f"Conv_{i}"])
        if D.has_bn[i]:
            _flax_bn_to_torch(D.bns[i], dp_np[f"BatchNorm_{bn_i}"])
            bn_i += 1
    _copy_dense(D.ca.fc1, dp_np["ChannelGate_0"]["Dense_0"])
    _copy_dense(D.ca.fc2, dp_np["ChannelGate_0"]["Dense_1"])
    with torch.no_grad():
        D.sa.conv.weight.copy_(torch.from_numpy(np.asarray(
            dp_np["SpatialGate_0"]["Conv_0"]["kernel"]).transpose(
                3, 2, 0, 1)))
    _flax_conv_to_torch(D.out, dp_np["Conv_6"])

    # forward parity before training
    data_rng = np.random.default_rng(11)
    probe = data_rng.random((2, 8, 8, 3)).astype(np.float32)
    ours0 = np.asarray(trainer.g_apply(trainer.state.g_params,
                                       trainer.state.g_stats,
                                       jnp.asarray(probe), False)[0])
    G.train()
    with torch.no_grad():
        ref0 = G(torch.from_numpy(probe.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours0, ref0.transpose(0, 2, 3, 1), atol=2e-5)

    G.train(), D.train()
    opt_g = torch.optim.Adam(G.parameters(), lr=cfg.optim.lr,
                             betas=(0.9, 0.999))
    opt_d = torch.optim.Adam(D.parameters(), lr=cfg.optim.lr,
                             betas=(0.9, 0.999))
    alpha_np = data_rng.random((4, 1, 1, 1)).astype(np.float32)
    monkeypatch.setattr(jax.random, "uniform",
                        lambda *a, **k: jnp.asarray(alpha_np))

    for step in range(10):
        lr_img = data_rng.random((4, 8, 8, 3)).astype(np.float32)
        hr_img = data_rng.random((4, 16, 16, 3)).astype(np.float32)
        batch = {"lr": jnp.asarray(lr_img), "hr": jnp.asarray(hr_img)}
        trainer.state, metrics = trainer._jit_step(trainer.state, batch,
                                                   jax.random.PRNGKey(step))
        rg, rd = _torch_reference_step(
            G, D, opt_g, opt_d,
            torch.from_numpy(lr_img.transpose(0, 3, 1, 2)),
            torch.from_numpy(hr_img.transpose(0, 3, 1, 2)),
            torch.from_numpy(alpha_np),
            w_gan=cfg.gan.weight_gan, lambda_gp=cfg.gan.lambda_gp,
            clip=cfg.gan.clip_value)
        assert float(metrics["loss_G"]) == pytest.approx(rg, rel=5e-4,
                                                         abs=1e-4), step
        assert float(metrics["loss_D"]) == pytest.approx(rd, rel=5e-4,
                                                         abs=5e-4), step

    # parameters after ten steps: gate/attention params prove the custom-VJP
    # backwards carried correct gradients the whole trajectory
    gp2 = jax.tree.map(np.asarray, trainer.state.g_params)
    dp2 = jax.tree.map(np.asarray, trainer.state.d_params)

    def close(ours, theirs, name, atol=1e-4, rtol=1e-3):
        np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=atol,
                                   rtol=rtol, err_msg=name)

    rab2 = gp2["ResGroup_0"]["RAB_0"]
    close(rab2["Conv_0"]["kernel"].transpose(3, 2, 0, 1), G.rab.c0.weight,
          "RAB wide conv")
    close(rab2["LocalAttention_0"]["SpatialGate_0"]["Conv_0"]["kernel"]
          .transpose(3, 2, 0, 1), G.rab.la.sa.conv.weight, "RAB SLAM kernel")
    close(rab2["LocalAttention_0"]["ChannelGate_0"]["Dense_0"]["kernel"].T,
          G.rab.la.ca.fc1.weight, "RAB CLAM fc1")
    ga2 = gp2["GlobalAttention_0"]
    close(ga2["ChannelSelfAttention_0"]["gamma"], G.cgam.gamma, "CGAM gamma")
    close(ga2["SpatialSelfAttention_0"]["gamma"], G.sgam.gamma, "SGAM gamma")
    close(ga2["SpatialSelfAttention_0"]["Conv_0"]["kernel"]
          .transpose(3, 2, 0, 1), G.sgam.q.weight, "SGAM q")
    close(gp2["UpsampleHead_0"]["Conv_0"]["kernel"].transpose(3, 2, 0, 1),
          G.up.weight, "upsample conv")
    close(dp2["SpatialGate_0"]["Conv_0"]["kernel"].transpose(3, 2, 0, 1),
          D.sa.conv.weight, "D SLAM kernel (grad-of-grad path)")
    close(dp2["ChannelGate_0"]["Dense_0"]["kernel"].T, D.ca.fc1.weight,
          "D CLAM fc1 (grad-of-grad path)")
    close(dp2["Conv_0"]["kernel"].transpose(3, 2, 0, 1), D.convs[0].weight,
          "D conv1")
