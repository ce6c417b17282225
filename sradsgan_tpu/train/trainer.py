"""Unified trainer: one jitted, mesh-sharded step for all nine models.

The reference repeats an ~800-line Python train loop per model file
(e.g. model/sradsgan.py:658-1056); here a single trainer covers the
pixel-only models (EDSR/DSSR/AMSSRN/HAT) and the GAN models
(SRGAN/DRCAN/SRAGAN/NDSRGAN/SRADSGAN) driven by the model registry's
loss recipe.

TPU-first design:
- ONE jitted train step containing the G update, the D update, and the
  WGAN gradient penalty (grad-of-grad through D replaces the reference's
  double ``backward`` at sradsgan.py:639) — XLA fuses and schedules the
  whole step; no Python between G and D updates;
- data parallelism via batch sharding over a 1-D ``jax.sharding.Mesh``;
  gradients are reduced by the psum XLA inserts — the entire communication
  surface (SURVEY.md §2.7);
- bfloat16 activations with float32 params/updates (cfg.bf16);
- host-side control only where the reference has host-side policy:
  plateau-backtrack lr halving with best-checkpoint reload
  (sradsgan.py:986-1036), NDSRGAN step decay (ndsrgan.py:395-399),
  chain-training warm start (sradsgan.py:716-721).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from sradsgan_tpu.core.checkpoint import (partial_restore, restore_pytree,
                                          save_pytree)
from sradsgan_tpu.core.config import TrainConfig
from sradsgan_tpu.data.datasets import build_test_dataset, build_train_dataset
from sradsgan_tpu.data.loader import DataLoader, device_prefetch
from sradsgan_tpu.losses import (VGG19Features, adversarial_loss_d,
                                 adversarial_loss_g, gradient_penalty,
                                 pixel_loss)
from sradsgan_tpu.losses.vgg import load_vgg19_params
from sradsgan_tpu.metrics import batched_ergas, batched_psnr, batched_ssim
from sradsgan_tpu.models import get_spec
from sradsgan_tpu.parallel.mesh import create_mesh, replicate
from sradsgan_tpu.train.state import (GANTrainState, get_lr, make_optimizer,
                                      set_lr)
from sradsgan_tpu.utils.logging import Logger


def _split_variables(variables) -> Tuple[Any, Any]:
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    return params, stats


def _apply_factory(model):
    """(params, stats, x, train) -> (out, new_stats), jit-stable structure."""

    def apply_fn(params, stats, x, train: bool):
        variables = {"params": params}
        if stats:
            variables["batch_stats"] = stats
            if train:
                out, updated = model.apply(variables, x, train=True,
                                           mutable=["batch_stats"])
                return out, updated["batch_stats"]
            return model.apply(variables, x, train=False), stats
        return model.apply(variables, x, train=train), stats

    return apply_fn


class Trainer:
    """Host-side driver around the single jitted train step."""

    def __init__(self, cfg: TrainConfig):
        from sradsgan_tpu.core.cache import enable_compilation_cache
        enable_compilation_cache()
        self.cfg = cfg
        self.spec = get_spec(cfg.model)
        dtype = jnp.bfloat16 if cfg.bf16 else None

        self.generator = self.spec.generator(scale=cfg.scale, dtype=dtype,
                                             **cfg.model_kwargs)
        self.g_apply = _apply_factory(self.generator)
        self.discriminator = None
        self.d_apply = None
        if self.spec.adversarial:
            # The discriminator always computes in float32: WGAN weight
            # clipping collapses its BatchNorm scales to +-clip_value and
            # the bf16 backward through 7 re-normalizing layers overflows
            # (measured: full-size bf16 GAN runs NaN within ~50 steps while
            # f32 is stable; docs/VALIDATION.md).  D is ~1/3 of the step,
            # so mixed G-bf16/D-f32 keeps most of the bf16 win.
            self.discriminator = self.spec.discriminator(dtype=None)
            self.d_apply = _apply_factory(self.discriminator)

        self.vgg = None
        self.vgg_params = None
        if self.spec.adversarial and self.spec.weight_content > 0:
            self.vgg = VGG19Features(dtype=dtype)
            loaded = load_vgg19_params()
            if loaded is not None:
                self.vgg_params = loaded["params"]

        self.mesh = create_mesh(cfg.num_devices)
        self.logger = Logger(cfg.model, os.path.join(cfg.model_dir, "logs"))
        self.g_opt_tx = make_optimizer(cfg.optim.lr, cfg.optim.b1,
                                       cfg.optim.b2)
        self.d_opt_tx = make_optimizer(cfg.optim.lr, cfg.optim.b1,
                                       cfg.optim.b2)
        self.state = self._init_state()
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_eval = jax.jit(self._eval_step)

    # ------------------------------------------------------------------
    # Initialization
    # ------------------------------------------------------------------
    def _init_state(self) -> GANTrainState:
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        k_g, k_d, k_v = jax.random.split(key, 3)
        lr_size = cfg.data.crop_size // cfg.scale
        x_lr = jnp.zeros((1, lr_size, lr_size, cfg.num_channels), jnp.float32)
        x_hr = jnp.zeros((1, cfg.data.crop_size, cfg.data.crop_size,
                          cfg.num_channels), jnp.float32)

        g_params, g_stats = _split_variables(
            self.generator.init(k_g, x_lr, train=False))
        d_params = d_stats = d_opt = None
        if self.discriminator is not None:
            d_params, d_stats = _split_variables(
                self.discriminator.init(k_d, x_hr, train=False))
            d_opt = self.d_opt_tx.init(d_params)
        if self.vgg is not None and self.vgg_params is None:
            # No pretrained weights available: fixed-seed random features
            # (documented in losses/vgg.py).
            self.vgg_params = self.vgg.init(k_v, x_hr)["params"]

        if cfg.init_from:  # chain training (reference sradsgan.py:716-721)
            prev = restore_pytree(cfg.init_from)
            g_params, kept, skipped = partial_restore(g_params,
                                                      prev["g_params"])
            print(f"chain init from {cfg.init_from}: kept {kept} leaves, "
                  f"re-initialized {skipped}")
            if d_params is not None and prev.get("d_params") is not None:
                d_params, _, _ = partial_restore(d_params, prev["d_params"])

        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, g_stats=g_stats,
            g_opt=self.g_opt_tx.init(g_params),
            d_params=d_params, d_stats=d_stats, d_opt=d_opt)
        return replicate(state, self.mesh)

    # ------------------------------------------------------------------
    # The single jitted step
    # ------------------------------------------------------------------
    def _train_step(self, state: GANTrainState, batch: Dict[str, jnp.ndarray],
                    rng: jax.Array):
        cfg = self.cfg
        spec = self.spec
        lr_img, hr_img = batch["lr"], batch["hr"]
        metrics: Dict[str, jnp.ndarray] = {}

        # ---------------- G update ----------------
        def g_loss_fn(g_params):
            sr, new_gstats = self.g_apply(g_params, state.g_stats, lr_img,
                                          True)
            loss = jnp.float32(0.0)
            p_loss = pixel_loss(sr, hr_img, spec.pixel_loss)
            loss += cfg.gan.weight_pixel * p_loss
            aux = {"pixel": p_loss}
            if self.vgg is not None and cfg.gan.weight_content > 0:
                feat_sr = self.vgg.apply({"params": self.vgg_params}, sr)
                feat_hr = jax.lax.stop_gradient(
                    self.vgg.apply({"params": self.vgg_params}, hr_img))
                c_loss = pixel_loss(feat_sr, feat_hr, spec.pixel_loss)
                loss += cfg.gan.weight_content * c_loss
                aux["content"] = c_loss
            if self.discriminator is not None:
                fake_logits, _ = self.d_apply(state.d_params, state.d_stats,
                                              sr, True)
                real_logits_g = None
                if cfg.gan.relativistic:  # RaGAN (sradsgan.py:841-848)
                    real_logits_g, _ = self.d_apply(state.d_params,
                                                    state.d_stats, hr_img,
                                                    True)
                adv = adversarial_loss_g(fake_logits, cfg.gan.gan_type,
                                         real_logits=real_logits_g,
                                         relativistic=cfg.gan.relativistic)
                loss += cfg.gan.weight_gan * adv
                aux["adv_g"] = adv
            return loss, (sr, new_gstats, aux)

        (loss_g, (sr, new_gstats, aux)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.g_params)
        g_updates, new_g_opt = self.g_opt_tx.update(g_grads, state.g_opt,
                                                    state.g_params)
        new_g_params = jax.tree.map(lambda p, u: p + u, state.g_params,
                                    g_updates)
        metrics["loss_G"] = loss_g
        metrics.update(aux)

        new_d_params, new_d_stats, new_d_opt = (state.d_params,
                                                state.d_stats, state.d_opt)
        if self.discriminator is not None:
            sr_detached = jax.lax.stop_gradient(sr)

            # ---------------- D update ----------------
            def d_loss_fn(d_params):
                real_logits, stats1 = self.d_apply(d_params, state.d_stats,
                                                   hr_img, True)
                fake_logits, stats2 = self.d_apply(d_params, stats1,
                                                   sr_detached, True)
                loss = adversarial_loss_d(real_logits, fake_logits,
                                          cfg.gan.gan_type,
                                          relativistic=cfg.gan.relativistic)
                if cfg.gan.gan_type == "wgan-gp":
                    gp = gradient_penalty(
                        lambda x: self.d_apply(d_params, state.d_stats, x,
                                               False)[0],
                        hr_img, sr_detached, rng)
                    loss = loss + cfg.gan.lambda_gp * gp
                return loss, stats2

            (loss_d, new_d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(state.d_params)
            d_updates, new_d_opt = self.d_opt_tx.update(d_grads, state.d_opt,
                                                        state.d_params)
            new_d_params = jax.tree.map(lambda p, u: p + u, state.d_params,
                                        d_updates)
            if cfg.gan.gan_type == "wgan-gp":
                c = cfg.gan.clip_value  # weight clip (sradsgan.py:890-892)
                new_d_params = jax.tree.map(
                    lambda p: jnp.clip(p, -c, c), new_d_params)
            metrics["loss_D"] = loss_d

        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params, g_stats=new_gstats, g_opt=new_g_opt,
            d_params=new_d_params, d_stats=new_d_stats, d_opt=new_d_opt)
        return new_state, metrics

    # ------------------------------------------------------------------
    # Evaluation step (fast on-device PSNR/SSIM vs HR and bicubic twin)
    # ------------------------------------------------------------------
    def _eval_step(self, state: GANTrainState,
                   batch: Dict[str, jnp.ndarray]):
        sr, _ = self.g_apply(state.g_params, state.g_stats, batch["lr"],
                             False)
        sr = sr.astype(jnp.float32)
        return {
            "psnr": batched_psnr(sr, batch["hr"]),
            "ssim": batched_ssim(sr, batch["hr"]),
            "ergas": batched_ergas(sr, batch["hr"], self.cfg.scale),
            "bc_psnr": batched_psnr(batch["bc"], batch["hr"]),
            "bc_ssim": batched_ssim(batch["bc"], batch["hr"]),
        }

    # ------------------------------------------------------------------
    # Validation sweep
    # ------------------------------------------------------------------
    def validate(self, max_batches: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        dataset = build_test_dataset(cfg.data, cfg.scale)
        loader = DataLoader(dataset, cfg.data.test_batch_size, shuffle=False,
                            drop_last=True, num_workers=cfg.data.num_workers)
        sums: Dict[str, float] = {}
        count = 0
        for i, batch in enumerate(device_prefetch(iter(loader), self.mesh)):
            if max_batches is not None and i >= max_batches:
                break
            batch.pop("path", None)
            out = self._jit_eval(self.state, batch)
            for k, v in out.items():
                arr = np.asarray(v)
                sums[k] = sums.get(k, 0.0) + float(arr.sum())
            count += int(np.asarray(out["psnr"]).size)
        return {k: v / max(count, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------
    # Training loop with plateau backtracking
    # ------------------------------------------------------------------
    def train(self, num_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        os.makedirs(cfg.model_dir, exist_ok=True)
        dataset = build_train_dataset(cfg.data, cfg.scale)
        rng = jax.random.PRNGKey(cfg.seed + 1)

        best = {"psnr": -np.inf, "ssim": -np.inf, "ergas": np.inf}
        best_path = os.path.join(cfg.model_dir, "ckpt_best")
        bad_epochs = 0
        step_count = 0
        t0 = time.time()
        last_metrics: Dict[str, float] = {}
        # loss/metric curves (reference plot_loss + avg_* histories,
        # utils/utils.py:55-86, sradsgan.py:1048-1056)
        self.history: Dict[str, list] = {"loss_G": [], "loss_D": [],
                                         "psnr": [], "ssim": [],
                                         "ergas": []}

        # With an explicit num_steps budget the epoch cap is lifted (smoke
        # runs and benchmarking drive by steps, not epochs).
        max_epochs = cfg.num_epochs if num_steps is None else 10 ** 9
        for epoch in range(cfg.start_epoch, max_epochs):
            lr_now = get_lr(self.state.g_opt)
            if lr_now < cfg.optim.lr_floor:  # stop rule (sradsgan.py:804)
                print(f"lr {lr_now:.2e} below floor; stopping")
                break
            loader = DataLoader(dataset, cfg.data.batch_size, shuffle=True,
                                drop_last=True,
                                num_workers=cfg.data.num_workers,
                                seed=cfg.seed + epoch)
            for batch in device_prefetch(iter(loader), self.mesh):
                batch.pop("path", None)
                rng, step_rng = jax.random.split(rng)
                self.state, metrics = self._jit_step(self.state, batch,
                                                     step_rng)
                step_count += 1
                if step_count % 50 == 0:
                    m = {k: float(v) for k, v in metrics.items()}
                    rate = (step_count * cfg.data.batch_size
                            * cfg.data.crop_size ** 2 / 1e6
                            / (time.time() - t0))
                    self.logger.print_format_results(
                        "train", {"epoch": epoch, "step": step_count,
                                  "MP/s": rate, **m})
                    for k, v in m.items():
                        self.logger.scalar_summary(k, v, step_count)
                if (cfg.sample_interval
                        and step_count % cfg.sample_interval == 0):
                    # in-training sample metrics vs the bicubic twin
                    # (reference sradsgan.py:911-969)
                    q = self._jit_eval(self.state, batch)
                    self.logger.print_format_results(
                        "train", {"epoch": epoch, "step": step_count,
                                  **{k: float(np.mean(np.asarray(v)))
                                     for k, v in q.items()}})
                if num_steps is not None and step_count >= num_steps:
                    return {k: float(v) for k, v in metrics.items()}

            # epoch end: validate + plateau logic (sradsgan.py:979-1036)
            val = self.validate(max_batches=32)
            last_metrics = val
            self.logger.print_format_results("val", {"epoch": epoch, **val})
            for k in ("loss_G", "loss_D"):
                if k in metrics:
                    self.history[k].append(float(metrics[k]))
            for k in ("psnr", "ssim", "ergas"):
                self.history[k].append(val[k])
            # reference resets the plateau counter when ANY tracked metric
            # improves (sradsgan.py:986-1036)
            improved = (val["psnr"] > best["psnr"]
                        or val["ssim"] > best["ssim"]
                        or val["ergas"] < best["ergas"])
            if improved:
                best["psnr"] = max(best["psnr"], val["psnr"])
                best["ssim"] = max(best["ssim"], val["ssim"])
                best["ergas"] = min(best["ergas"], val["ergas"])
                bad_epochs = 0
                save_pytree(best_path, {"g_params": self.state.g_params,
                                        "g_stats": self.state.g_stats,
                                        "d_params": self.state.d_params})
            else:
                bad_epochs += 1
                if bad_epochs >= cfg.optim.plateau_patience:
                    # reload best G and halve lr (sradsgan.py:986-1036)
                    if os.path.exists(best_path):
                        prev = restore_pytree(best_path)
                        self.state = self.state.replace(
                            g_params=jax.tree.map(jnp.asarray,
                                                  prev["g_params"]))
                    else:
                        print("plateau: no best checkpoint yet "
                              "(no finite-improvement epoch so far)")
                    new_lr = get_lr(self.state.g_opt) * 0.5
                    self.state = self.state.replace(
                        g_opt=set_lr(self.state.g_opt, new_lr))
                    if self.state.d_opt is not None:
                        self.state = self.state.replace(
                            d_opt=set_lr(self.state.d_opt, new_lr))
                    bad_epochs = 0
                    print(f"plateau: reloaded best, lr -> {new_lr:.2e}")
            if (cfg.optim.step_decay_epochs
                    and (epoch + 1) % cfg.optim.step_decay_epochs == 0):
                new_lr = get_lr(self.state.g_opt) * cfg.optim.step_decay_gamma
                self.state = self.state.replace(
                    g_opt=set_lr(self.state.g_opt, new_lr))

            if (epoch + 1) % cfg.save_epochs == 0:
                self.save_checkpoint(epoch)

        from sradsgan_tpu.utils.plotting import plot_curves
        plot_curves(self.history,
                    os.path.join(cfg.model_dir, "train_curves.png"))
        return last_metrics

    # ------------------------------------------------------------------
    def save_checkpoint(self, epoch: int,
                        include_optimizer: bool = False) -> str:
        """Per-epoch G/D save (reference sradsgan.py:1197-1207); pass
        include_optimizer=True for full-state resume (GDP model.py:126-146
        saves optimizer state too)."""
        path = os.path.join(self.cfg.model_dir, f"ckpt_epoch_{epoch}")
        tree = {
            "g_params": self.state.g_params, "g_stats": self.state.g_stats,
            "d_params": self.state.d_params, "d_stats": self.state.d_stats,
            "step": self.state.step}
        if include_optimizer:
            tree["g_opt"] = self.state.g_opt
            tree["d_opt"] = self.state.d_opt
        save_pytree(path, tree)
        return path

    def load_checkpoint(self, path: str) -> None:
        prev = restore_pytree(path)
        self.state = self.state.replace(
            g_params=jax.tree.map(jnp.asarray, prev["g_params"]),
            g_stats=jax.tree.map(jnp.asarray, prev["g_stats"]))
        if prev.get("d_params") is not None and self.state.d_params is not None:
            self.state = self.state.replace(
                d_params=jax.tree.map(jnp.asarray, prev["d_params"]))
