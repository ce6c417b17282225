"""Diffusion SR trainer — the GDP_x0 DDPM wrapper, TPU-native.

Reference: GDP_x0/model/model.py:12-168 (Adam, sum/bchw loss, test() via
super_resolution, checkpointing incl. optimizer state) and sr_mfe.py's step
loop with val-every-val_freq full metric suite vs bicubic (:124-261).

Data: the shared host pipeline's (lr, hr, bc) triplets in [0,1] map to GDP's
{HR, SR} in [-1,1] (GDP normalizes to [-1,1] and conditions on the bicubic
re-up, GDP_x0/data/LRHR_dataset.py:9-128).  Training is one jitted step over
the data mesh; sampling is the lax.scan ancestral chain.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax

from sradsgan_tpu.core.checkpoint import restore_pytree, save_pytree
from sradsgan_tpu.core.config import DataConfig
from sradsgan_tpu.data.datasets import build_test_dataset, build_train_dataset
from sradsgan_tpu.data.loader import DataLoader, device_prefetch
from sradsgan_tpu.diffusion.gaussian import (Schedule, p_losses,
                                             p_sample_chain, p_sample_loop)
from sradsgan_tpu.diffusion.unet import UNet
from sradsgan_tpu.metrics import (compare_ergas, compare_mse, compare_psnr,
                                  compare_ssim, tensor_to_uint8)
from sradsgan_tpu.parallel.mesh import create_mesh, replicate
from sradsgan_tpu.utils.logging import Logger


class DiffusionTrainer:
    def __init__(self, data_cfg: DataConfig, scale: int,
                 save_dir: str = "Result/GDP",
                 schedule: str = "linear", n_timestep: int = 1000,
                 linear_start: float = 1e-4, linear_end: float = 2e-2,
                 lr: float = 1e-4, unet_kwargs: Optional[dict] = None,
                 bf16: bool = True, seed: int = 0, num_devices: int = -1):
        self.data_cfg = data_cfg
        self.scale = scale
        self.save_dir = save_dir
        self.sched = Schedule.create(schedule, n_timestep, linear_start,
                                     linear_end)
        self.mesh = create_mesh(num_devices)
        self.logger = Logger("gdp", os.path.join(save_dir, "logs"))
        dtype = jnp.bfloat16 if bf16 else None
        unet_kwargs = dict(unet_kwargs or {})
        unet_kwargs.setdefault("image_size", data_cfg.crop_size)
        self.unet = UNet(dtype=dtype, **unet_kwargs)

        size = data_cfg.crop_size
        key = jax.random.PRNGKey(seed)
        x = jnp.zeros((1, size, size, 6), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        self.params = self.unet.init(key, x, t, train=False)["params"]
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self.params = replicate(self.params, self.mesh)
        self.opt_state = replicate(self.opt_state, self.mesh)
        self.step = 0

        def apply_fn(variables, x, t, train, rng):
            kwargs = {"rngs": {"dropout": rng}} if (train and rng is not None
                                                    ) else {}
            return self.unet.apply({"params": variables}, x, t, train=train,
                                   **kwargs)

        self._apply = apply_fn

        def train_step(params, opt_state, batch, rng):
            def loss_fn(p):
                return p_losses(self._apply, p, self.sched, batch, rng)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt, loss

        self._jit_train = jax.jit(train_step, donate_argnums=(0, 1))
        self._jit_sample = jax.jit(
            lambda params, cond, rng: p_sample_loop(
                self._apply, params, self.sched, cond, rng))

    # ------------------------------------------------------------------
    def train(self, n_iter: int, val_freq: int = 0,
              log_freq: int = 50) -> float:
        ds = build_train_dataset(self.data_cfg, self.scale)
        rng = jax.random.PRNGKey(1)
        loss = None
        t0 = time.time()
        while self.step < n_iter:
            loader = DataLoader(ds, self.data_cfg.batch_size, shuffle=True,
                                num_workers=self.data_cfg.num_workers,
                                seed=self.step)
            for batch in device_prefetch(iter(loader), self.mesh):
                batch.pop("path", None)
                gdp_batch = {"HR": 2.0 * batch["hr"] - 1.0,
                             "SR": 2.0 * batch["bc"] - 1.0}
                rng, k = jax.random.split(rng)
                self.params, self.opt_state, loss = self._jit_train(
                    self.params, self.opt_state, gdp_batch, k)
                self.step += 1
                if self.step % log_freq == 0:
                    self.logger.print_format_results(
                        "train", {"iter": self.step,
                                  "loss": float(loss),
                                  "it/s": self.step / (time.time() - t0)})
                if val_freq and self.step % val_freq == 0:
                    val = self.validate(max_images=4)
                    self.logger.print_format_results(
                        "val", {"iter": self.step, **val})
                if self.step >= n_iter:
                    break
        return float(loss) if loss is not None else float("nan")

    # ------------------------------------------------------------------
    def super_resolution(self, bc01: np.ndarray,
                         rng: Optional[jax.Array] = None) -> np.ndarray:
        """Bicubic-upsampled LR [0,1] NHWC -> sampled SR [0,1].

        Inputs are reflect-padded to a multiple of the UNet's total
        downsampling factor and cropped back (arbitrary scene sizes)."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.step)
        mult = 2 ** (len(self.unet.channel_mults) - 1)
        b, h, w, c = bc01.shape
        ph = (mult - h % mult) % mult
        pw = (mult - w % mult) % mult
        padded = np.pad(bc01, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect") if (ph or pw) else bc01
        cond = jnp.asarray(padded, jnp.float32) * 2.0 - 1.0
        out = self._jit_sample(self.params, cond, rng)
        out = np.asarray((out.astype(jnp.float32) + 1.0) * 0.5)
        return out[:, :h, :w, :]

    def super_resolution_chain(self, bc01: np.ndarray,
                               n_snapshots: int = 10,
                               rng: Optional[jax.Array] = None) -> np.ndarray:
        """Continuous-sampling mode: return the reverse-chain snapshots
        (reference sr_mfe.py:275-403 val phase), [0,1], shape
        (n_snapshots+1, B, H, W, C)."""
        rng = rng if rng is not None else jax.random.PRNGKey(self.step)
        mult = 2 ** (len(self.unet.channel_mults) - 1)
        b, h, w, c = bc01.shape
        ph = (mult - h % mult) % mult
        pw = (mult - w % mult) % mult
        padded = np.pad(bc01, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect") if (ph or pw) else bc01
        cond = jnp.asarray(padded, jnp.float32) * 2.0 - 1.0
        chain = p_sample_chain(self._apply, self.params, self.sched, cond,
                               rng, n_snapshots)
        out = np.asarray(jnp.clip((chain.astype(jnp.float32) + 1) * 0.5,
                                  0, 1))
        return out[:, :, :h, :w, :]

    @classmethod
    def from_gdp_config(cls, path_or_name: str, data_cfg: DataConfig,
                        save_dir: str = "Result/GDP", **overrides):
        """Build a trainer from a GDP-style JSON config
        (diffusion/config.py)."""
        from sradsgan_tpu.diffusion.config import (load_gdp_config,
                                                   trainer_kwargs_from_config)
        cfg = load_gdp_config(path_or_name)
        kwargs = trainer_kwargs_from_config(cfg)
        kwargs.update(overrides)
        return cls(data_cfg, save_dir=save_dir, **kwargs)

    def validate(self, max_images: int = 4,
                 result_dir: Optional[str] = None,
                 continuous: bool = False,
                 n_snapshots: int = 8) -> Dict[str, float]:
        """Full metric suite vs the bicubic twin (reference sr_mfe.py:124-261):
        MSE/PSNR/SSIM/ERGAS/LPIPS for both the sampled SR and the bicubic
        baseline, plus per-image hr/sr/lr/inf ``.tif`` dumps and an annotated
        HR/LR/Bicubic/SR panel (``{step}_{idx}_plot.png``, the reference's
        Metrics.plot_img call at sr_mfe.py:345-348) when ``result_dir`` is
        given.  ``continuous=True`` is the reference's ``-p val`` continuous
        sampling: the reverse-chain snapshots are saved as a
        ``{step}_{idx}_sr_process.png`` grid (sr_mfe.py:305-319)."""
        from sradsgan_tpu.losses.lpips import lpips_fn, lpips_is_calibrated
        ds = build_test_dataset(self.data_cfg, self.scale)
        loader = DataLoader(ds, min(max_images, 4), shuffle=False,
                            drop_last=False, num_workers=2)
        lpips = lpips_fn()
        lpips_key = "lpips" if lpips_is_calibrated() else "lpips*"
        if result_dir:
            os.makedirs(result_dir, exist_ok=True)
        rows = []
        seen = 0
        for batch in loader:
            chain = None
            if continuous:
                chain = self.super_resolution_chain(batch["bc"],
                                                    n_snapshots=n_snapshots)
                sr = chain[-1]
            else:
                sr = self.super_resolution(batch["bc"])
            for i in range(sr.shape[0]):
                if seen >= max_images:
                    break
                seen += 1
                sr_u8 = tensor_to_uint8(sr[i])
                hr_u8 = tensor_to_uint8(batch["hr"][i])
                bc_u8 = tensor_to_uint8(batch["bc"][i])
                row = {
                    "mse": compare_mse(sr_u8, hr_u8),
                    "psnr": compare_psnr(sr_u8, hr_u8),
                    "ssim": compare_ssim(sr_u8, hr_u8),
                    "ergas": compare_ergas(hr_u8, sr_u8, self.scale),
                    lpips_key: lpips(sr[i], batch["hr"][i]),
                    "bc_mse": compare_mse(bc_u8, hr_u8),
                    "bc_psnr": compare_psnr(bc_u8, hr_u8),
                    "bc_ssim": compare_ssim(bc_u8, hr_u8),
                    "bc_ergas": compare_ergas(hr_u8, bc_u8, self.scale),
                    "bc_" + lpips_key: lpips(batch["bc"][i], batch["hr"][i]),
                }
                rows.append(row)
                if result_dir:
                    import cv2
                    from sradsgan_tpu.utils.plotting import (plot_chain_grid,
                                                             plot_test_panel)
                    lr_u8 = tensor_to_uint8(batch["lr"][i])
                    for name, img in (("hr", hr_u8), ("sr", sr_u8),
                                      ("lr", lr_u8), ("inf", bc_u8)):
                        cv2.imwrite(os.path.join(
                            result_dir, f"{self.step}_{seen}_{name}.tif"),
                            img[..., ::-1])  # RGB -> cv2 BGR
                    bc_m = {k: row["bc_" + k] for k in
                            ("mse", "psnr", "ssim", "ergas")}
                    sr_m = {k: row[k] for k in
                            ("mse", "psnr", "ssim", "ergas")}
                    plot_test_panel(
                        [batch["hr"][i], batch["lr"][i], batch["bc"][i],
                         sr[i]],
                        ["HR", "LR", "Bicubic", "SR"],
                        [None, None, bc_m, sr_m],
                        os.path.join(result_dir,
                                     f"{self.step}_{seen}_plot.png"))
                    if chain is not None:
                        plot_chain_grid(
                            chain[:, i],
                            os.path.join(
                                result_dir,
                                f"{self.step}_{seen}_sr_process.png"))
            if seen >= max_images:
                break
        return {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}

    # ------------------------------------------------------------------
    def save_checkpoint(self, tag: str = "latest") -> str:
        """Save params AND optimizer state (the reference saves gen + opt so
        an 866,800-iter run is resumable, GDP_x0/model/model.py:126-146)."""
        path = os.path.join(self.save_dir, f"gdp_ckpt_{tag}")
        save_pytree(path, {"params": self.params,
                           "opt_state": self.opt_state,
                           "step": np.asarray(self.step)})
        return path

    def load_checkpoint(self, path: str) -> None:
        """Restore params, optimizer state, and step counter
        (GDP_x0/model/model.py:148-168 resume_state)."""
        try:
            # full-state restore against the live structure (keeps the
            # optax NamedTuple chain intact)
            state = restore_pytree(path, {"params": self.params,
                                          "opt_state": self.opt_state,
                                          "step": np.asarray(self.step)})
            self.opt_state = jax.tree.map(jnp.asarray, state["opt_state"])
        except Exception:
            # params-only checkpoint (pre-r2 format)
            state = restore_pytree(path)
        self.params = jax.tree.map(jnp.asarray, state["params"])
        self.step = int(np.asarray(
            state.get("step", state.get("opt_state_step", 0))))
