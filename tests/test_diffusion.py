"""Diffusion SR sub-package tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sradsgan_tpu.core.config import DataConfig
from sradsgan_tpu.diffusion.gaussian import (Schedule, make_beta_schedule,
                                             p_sample_loop, q_sample)
from sradsgan_tpu.diffusion.trainer import DiffusionTrainer


def test_beta_schedules():
    for name in ["linear", "quad", "warmup10", "warmup50", "const", "jsd",
                 "cosine"]:
        betas = make_beta_schedule(name, 100)
        assert betas.shape == (100,)
        assert np.all(betas > 0) and np.all(betas <= 1)


def test_q_sample_interpolates():
    sched = Schedule.create(n_timestep=10)
    x0 = jnp.ones((1, 8, 8, 3))
    noise = jnp.zeros_like(x0)
    t = jnp.array([0])
    out = q_sample(sched, x0, t, noise)
    # at t=0 with zero noise, x_t ~= sqrt(alpha_bar_0) * x0
    assert float(out[0, 0, 0, 0]) == pytest.approx(
        float(sched.sqrt_alphas_cumprod[0]))


def _tiny_trainer(tmpdir, timesteps=8):
    cfg = DataConfig(synthetic=True, synthetic_size=8, crop_size=16,
                     test_crop_size=16, batch_size=4, test_batch_size=2,
                     num_workers=2)
    return DiffusionTrainer(cfg, scale=2, save_dir=str(tmpdir),
                            n_timestep=timesteps, bf16=False,
                            unet_kwargs={"inner_channel": 32,
                                         "channel_mults": (1, 2),
                                         "res_blocks": 1})


def test_diffusion_train_and_sample(tmp_path):
    trainer = _tiny_trainer(tmp_path)
    loss = trainer.train(n_iter=2)
    assert np.isfinite(loss)
    bc = np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)
    sr = trainer.super_resolution(bc)
    assert sr.shape == (1, 16, 16, 3)
    assert np.all(np.isfinite(sr))
    # checkpoint roundtrip
    path = trainer.save_checkpoint("test")
    trainer.load_checkpoint(path)


def test_diffusion_validate(tmp_path):
    """Full metric suite incl. LPIPS + .tif dumps (reference
    sr_mfe.py:124-261)."""
    import os

    trainer = _tiny_trainer(tmp_path)
    result_dir = str(tmp_path / "val_out")
    val = trainer.validate(max_images=2, result_dir=result_dir)
    for key in ("mse", "psnr", "ssim", "ergas", "bc_mse", "bc_psnr",
                "bc_ssim", "bc_ergas"):
        assert np.isfinite(val[key]), (key, val)
    assert any(k.startswith("lpips") for k in val)       # lpips or lpips*
    files = sorted(os.listdir(result_dir))
    tifs = [t for t in files if t.endswith(".tif")]
    # 2 images x {hr, sr, lr, inf}
    assert len(tifs) == 8, files
    # annotated HR/LR/Bicubic/SR panel per image (reference plot_img,
    # sr_mfe.py:345-348)
    panels = [t for t in files if t.endswith("_plot.png")]
    assert len(panels) == 2, files
    import cv2
    img = cv2.imread(os.path.join(result_dir, tifs[0]))
    assert img is not None and img.ndim == 3


def test_diffusion_validate_continuous(tmp_path):
    """Continuous sampling saves the reverse-chain process grid
    (reference sr_mfe.py:305-319 'grid' mode)."""
    import os

    trainer = _tiny_trainer(tmp_path)
    result_dir = str(tmp_path / "val_cont")
    val = trainer.validate(max_images=1, result_dir=result_dir,
                           continuous=True, n_snapshots=3)
    assert np.isfinite(val["psnr"])
    files = sorted(os.listdir(result_dir))
    assert any(f.endswith("_sr_process.png") for f in files), files


def test_diffusion_resume_restores_optimizer(tmp_path):
    """Checkpoints carry optimizer state so long runs resume exactly
    (reference GDP_x0/model/model.py:126-168)."""
    trainer = _tiny_trainer(tmp_path)
    trainer.train(n_iter=2)
    path = trainer.save_checkpoint("resume")
    mu_before = jax.tree.leaves(trainer.opt_state)[1]  # adam mu leaf

    fresh = _tiny_trainer(tmp_path)
    assert fresh.step == 0
    fresh.load_checkpoint(path)
    assert fresh.step == 2
    mu_after = jax.tree.leaves(fresh.opt_state)[1]
    np.testing.assert_allclose(np.asarray(mu_before), np.asarray(mu_after))
    # params restored too
    p0 = jax.tree.leaves(trainer.params)[0]
    p1 = jax.tree.leaves(fresh.params)[0]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1))


def test_diffusion_honors_num_devices(tmp_path):
    cfg = DataConfig(synthetic=True, synthetic_size=8, crop_size=16,
                     test_crop_size=16, batch_size=4, num_workers=2)
    trainer = DiffusionTrainer(cfg, scale=2, save_dir=str(tmp_path),
                               n_timestep=4, bf16=False, num_devices=2,
                               unet_kwargs={"inner_channel": 32,
                                            "channel_mults": (1, 2),
                                            "res_blocks": 1})
    assert trainer.mesh.devices.size == 2


def test_gdp_config_loading():
    from sradsgan_tpu.diffusion.config import (load_gdp_config,
                                               trainer_kwargs_from_config)
    for name, scale in [("gdp_train_27_216", 8), ("gdp_test_108_216", 2),
                        ("gdp_GF2_x3", 3), ("gdp_Sentinel2_x9", 9)]:
        cfg = load_gdp_config(name)
        kw = trainer_kwargs_from_config(cfg)
        assert kw["scale"] == scale, (name, kw)
        assert kw["unet_kwargs"]["in_channel"] == 6
        assert kw["n_timestep"] == 1000


def test_sample_chain_snapshots(tmp_path):
    trainer = _tiny_trainer(tmp_path)
    bc = np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)
    chain = trainer.super_resolution_chain(bc, n_snapshots=4)
    assert chain.shape == (5, 1, 16, 16, 3)
    assert np.all(np.isfinite(chain))


def test_sample_arbitrary_size(tmp_path):
    """Non-multiple-of-8 scenes are padded and cropped back."""
    trainer = _tiny_trainer(tmp_path)
    bc = np.random.default_rng(0).random((1, 13, 11, 3)).astype(np.float32)
    sr = trainer.super_resolution(bc)
    assert sr.shape == (1, 13, 11, 3)
    assert np.all(np.isfinite(sr))


def test_diffusion_train_step_mesh_invariant(tmp_path):
    """The diffusion train step is mesh-size invariant: identical loss and
    params on 1 vs 8 devices (the GAN step's test_sharding.py analog; the
    reference is single-GPU, GDP_x0/model/model.py:12-58)."""
    import jax
    from sradsgan_tpu.data.loader import device_prefetch
    from sradsgan_tpu.parallel.mesh import shard_batch

    rng = np.random.default_rng(5)
    batch = {"HR": 2.0 * rng.random((8, 16, 16, 3)).astype(np.float32) - 1.0,
             "SR": 2.0 * rng.random((8, 16, 16, 3)).astype(np.float32) - 1.0}
    key = jax.random.PRNGKey(3)
    results = {}
    for n_dev in (1, 8):
        cfg = DataConfig(synthetic=True, synthetic_size=8, crop_size=16,
                         test_crop_size=16, batch_size=8, num_workers=2)
        trainer = DiffusionTrainer(cfg, scale=2, save_dir=str(tmp_path),
                                   n_timestep=8, bf16=False,
                                   num_devices=n_dev,
                                   unet_kwargs={"inner_channel": 32,
                                                "channel_mults": (1, 2),
                                                "res_blocks": 1})
        sharded = shard_batch(batch, trainer.mesh)
        params, _, loss = trainer._jit_train(trainer.params,
                                             trainer.opt_state, sharded, key)
        results[n_dev] = (jax.tree.map(np.asarray, params), float(loss))
    assert abs(results[1][1] - results[8][1]) < 1e-6
    for a, b in zip(jax.tree.leaves(results[1][0]),
                    jax.tree.leaves(results[8][0])):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_batched_sampler_multi_image(tmp_path):
    """The ancestral sampler amortizes over a batch: sampling 3 images in
    one call equals per-image shapes and stays finite (reference hot loop
    GDP_x0/model/gdp_modules/diffusion.py:207-237 is single-image)."""
    trainer = _tiny_trainer(tmp_path, timesteps=6)
    bc = np.random.default_rng(1).random((3, 16, 16, 3)).astype(np.float32)
    sr = trainer.super_resolution(bc)
    assert sr.shape == (3, 16, 16, 3)
    assert np.all(np.isfinite(sr))
