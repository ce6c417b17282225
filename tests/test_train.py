"""End-to-end training smoke tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from sradsgan_tpu.core.config import config_for_model
from sradsgan_tpu.train.trainer import Trainer


def _tiny_cfg(model, scale=2, **model_kwargs):
    cfg = config_for_model(model, scale)
    cfg.bf16 = False
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 32
    cfg.data.crop_size = 32
    cfg.data.test_crop_size = 32
    cfg.data.batch_size = 8
    cfg.data.test_batch_size = 8
    cfg.data.num_workers = 2
    cfg.model_kwargs = model_kwargs
    cfg.save_dir = "/tmp/sradsgan_tpu_test"
    return cfg


def test_edsr_pixel_training_reduces_loss():
    cfg = _tiny_cfg("edsr", base_filters=16, num_residuals=2)
    cfg.optim.lr = 5e-3
    trainer = Trainer(cfg)
    import jax
    rng = jax.random.PRNGKey(0)
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    ds = build_train_dataset(cfg.data, cfg.scale)
    losses = []
    for epoch in range(10):
        loader = DataLoader(ds, cfg.data.batch_size, num_workers=2,
                            seed=epoch)
        for batch in device_prefetch(iter(loader), trainer.mesh):
            batch.pop("path", None)
            rng, k = jax.random.split(rng)
            trainer.state, metrics = trainer._jit_step(trainer.state, batch, k)
            losses.append(float(metrics["loss_G"]))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_gan_training_step_runs_and_validates():
    cfg = _tiny_cfg("srgan", base_filters=8, num_residuals=1)
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=3)
    assert "loss_G" in out and "loss_D" in out
    assert np.isfinite(out["loss_G"]) and np.isfinite(out["loss_D"])
    val = trainer.validate(max_batches=1)
    assert np.isfinite(val["psnr"]) and 0 < val["ssim"] <= 1


def test_wgan_gp_step_runs():
    cfg = _tiny_cfg("sradsgan", n_groups=1, n_blocks=1)
    cfg.data.crop_size = 24
    cfg.data.test_crop_size = 24
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=2)
    assert np.isfinite(out["loss_G"]) and np.isfinite(out["loss_D"])


def test_checkpoint_roundtrip_and_chain_init(tmp_path):
    cfg = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg.save_dir = str(tmp_path)
    trainer = Trainer(cfg)
    trainer.train(num_steps=1)
    path = trainer.save_checkpoint(0)

    # chain training: x2 checkpoint warm-starts an x4 model (upsample tail
    # differs; body restores)
    cfg4 = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg4.scale = 4
    cfg4.save_dir = str(tmp_path)
    cfg4.init_from = path
    trainer4 = Trainer(cfg4)
    out = trainer4.train(num_steps=1)
    assert np.isfinite(out["loss_G"])


def test_hat_trains_a_step():
    cfg = _tiny_cfg("hat", scale=2, embed_dim=12, depths=(1,),
                    num_heads=(2,), window_size=4)
    cfg.data.crop_size = 16
    cfg.data.test_crop_size = 16
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=2)
    assert np.isfinite(out["loss_G"])
