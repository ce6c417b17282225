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
from sradsgan_tpu.parallel.mesh import create_mesh, replicate, shard_batch
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
            # bf16 discriminator convs (f32 BatchNorm chain regardless —
            # nn/norm.py).  Round 2 recorded bf16-D divergence and pinned
            # the D to f32; the round-3 retest AFTER the fused-pool
            # tie-count VJP fix runs 600 steps finite and tracks the f32
            # loss trajectory to ~1e-4 at 87.1 vs 99.4 ms/step
            # (docs/VALIDATION.md "Round-3 retest").  cfg.d_bf16 gates it
            # and only takes effect when the model computes bf16 overall,
            # so f32 runs (parity oracles) keep an f32 D.
            d_dtype = jnp.bfloat16 if (cfg.d_bf16 and cfg.bf16) else None
            self.discriminator = self.spec.discriminator(dtype=d_dtype)
            self.d_apply = _apply_factory(self.discriminator)

        self.vgg = None
        self.vgg_params = None
        if self.spec.adversarial and self.spec.weight_content > 0:
            self.vgg = VGG19Features(dtype=dtype)
            loaded = load_vgg19_params()
            if loaded is not None:
                self.vgg_params = loaded["params"]
            else:
                import sys
                print("note: VGG19 pretrained weights not provided "
                      "(SRADSGAN_TPU_VGG19_NPZ); the content loss uses "
                      "fixed-seed random features — training works, but "
                      "content-loss values are not reference-comparable "
                      "(losses/vgg.py)", file=sys.stderr)

        # Flat-vector optimizer states (round 4, opt-in,
        # SRADSGAN_TPU_FLAT_OPT=1): the device trace (scripts/trace_step.py)
        # showed ~8-9 ms/step of per-PARAMETER op soup — each of the ~400
        # G/D leaves gets its own Adam m/v/update fusions plus the p+u add
        # and (D) weight clip.  Raveling grads/params to ONE f32 vector is
        # bit-identical leaf-by-leaf (Adam/clip are elementwise; the
        # reference clips every D param, sradsgan.py:890-892) and removes
        # ~2.8k ops/step — but MEASURED NET-NEGATIVE on hardware (+1.5
        # ms/step, bench 8.50 vs 8.63 MP/s): the saved fusion soup (-3.2
        # ms) is outweighed by the grad-ravel concatenates, the unravel
        # reshapes, and conv prologues that now convert sliced f32 weights
        # in-fusion (+4.5 ms; trace diff in docs/PERF.md round 4).  Kept as
        # a documented negative result.
        self._flat_opt = os.environ.get("SRADSGAN_TPU_FLAT_OPT", "0") == "1"

        self.mesh = create_mesh(cfg.num_devices)
        self.logger = Logger(cfg.model, os.path.join(cfg.model_dir, "logs"))
        self.g_opt_tx = make_optimizer(cfg.optim.lr, cfg.optim.b1,
                                       cfg.optim.b2)
        self.d_opt_tx = make_optimizer(cfg.optim.lr, cfg.optim.b1,
                                       cfg.optim.b2)
        self.state = self._init_state()
        self._jit_step = jax.jit(self._train_step, donate_argnums=(0,))
        self._jit_multi_step = jax.jit(self._multi_step, donate_argnums=(0,))
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

        if self._flat_opt:
            from jax.flatten_util import ravel_pytree
            g_opt = self.g_opt_tx.init(ravel_pytree(g_params)[0])
            if d_params is not None:
                d_opt = self.d_opt_tx.init(ravel_pytree(d_params)[0])
        else:
            g_opt = self.g_opt_tx.init(g_params)
            if d_params is not None:
                d_opt = self.d_opt_tx.init(d_params)

        state = GANTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, g_stats=g_stats,
            g_opt=g_opt,
            d_params=d_params, d_stats=d_stats, d_opt=d_opt)
        return replicate(state, self.mesh)

    # ------------------------------------------------------------------
    # The single jitted step
    # ------------------------------------------------------------------
    def _pixel_content_loss(self, sr, hr_img, aux):
        cfg, spec = self.cfg, self.spec
        loss = jnp.float32(0.0)
        p_loss = pixel_loss(sr, hr_img, spec.pixel_loss)
        loss += cfg.gan.weight_pixel * p_loss
        aux["pixel"] = p_loss
        if self.vgg is not None and cfg.gan.weight_content > 0:
            # One batch-2B VGG forward instead of two batch-B forwards:
            # XLA compiles two separate conv chains otherwise, doubling
            # per-layer dispatch/fusion boundaries.  The HR half carries no
            # gradient (stop_gradient), matching the reference's detached
            # target features (model/sradsgan.py:836-838).
            feats = self.vgg.apply(
                {"params": self.vgg_params},
                jnp.concatenate([sr, jax.lax.stop_gradient(hr_img)], axis=0))
            feat_sr, feat_hr = jnp.split(feats, 2, axis=0)
            c_loss = pixel_loss(feat_sr, jax.lax.stop_gradient(feat_hr),
                                spec.pixel_loss)
            loss += cfg.gan.weight_content * c_loss
            aux["content"] = c_loss
        return loss

    def _train_step(self, state: GANTrainState, batch: Dict[str, jnp.ndarray],
                    rng: jax.Array):
        cfg = self.cfg
        lr_img, hr_img = batch["lr"], batch["hr"]
        metrics: Dict[str, jnp.ndarray] = {}

        # For (non-relativistic) WGAN the G adversarial term and the D fake
        # term are both linear in mean(D(sr)), so ONE D(sr) forward+backward
        # serves both updates: grad_d of the joint G loss is
        # -weight_gan * grad_d mean(D(sr)), which rescales into the D fake
        # grads.  The reference (and our round-1 step) pays this D(sr) pass
        # twice (model/sradsgan.py:832-892); the logits are identical in
        # both places (same weights, same batch — BN train mode normalizes
        # by batch statistics), so sharing is semantics-preserving.
        shared_fake = (self.discriminator is not None
                       and cfg.gan.gan_type == "wgan-gp"
                       and not cfg.gan.relativistic
                       and cfg.gan.weight_gan > 0)

        if shared_fake:
            w_gan = cfg.gan.weight_gan

            def joint_fn(g_params, d_params):
                sr, new_gstats = self.g_apply(g_params, state.g_stats,
                                              lr_img, True)
                aux: Dict[str, jnp.ndarray] = {}
                loss = self._pixel_content_loss(sr, hr_img, aux)
                fake_logits, d_stats_fake = self.d_apply(d_params,
                                                         state.d_stats, sr,
                                                         True)
                mean_fake = jnp.mean(fake_logits.astype(jnp.float32))
                aux["adv_g"] = -mean_fake
                loss = loss + w_gan * -mean_fake
                return loss, (sr, new_gstats, d_stats_fake, mean_fake, aux)

            (loss_g, (sr, new_gstats, d_stats_fake, mean_fake, aux)), \
                (g_grads, d_grads_scaled) = jax.value_and_grad(
                    joint_fn, argnums=(0, 1), has_aux=True)(
                        state.g_params, state.d_params)
            d_grads_fake = jax.tree.map(lambda t: t / -w_gan, d_grads_scaled)
        else:
            def g_loss_fn(g_params):
                sr, new_gstats = self.g_apply(g_params, state.g_stats,
                                              lr_img, True)
                aux: Dict[str, jnp.ndarray] = {}
                loss = self._pixel_content_loss(sr, hr_img, aux)
                if self.discriminator is not None:
                    fake_logits, _ = self.d_apply(state.d_params,
                                                  state.d_stats, sr, True)
                    real_logits_g = None
                    if cfg.gan.relativistic:  # RaGAN (sradsgan.py:841-848)
                        real_logits_g, _ = self.d_apply(state.d_params,
                                                        state.d_stats,
                                                        hr_img, True)
                    adv = adversarial_loss_g(
                        fake_logits, cfg.gan.gan_type,
                        real_logits=real_logits_g,
                        relativistic=cfg.gan.relativistic)
                    loss += cfg.gan.weight_gan * adv
                    aux["adv_g"] = adv
                return loss, (sr, new_gstats, aux)

            (loss_g, (sr, new_gstats, aux)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(state.g_params)

        if self._flat_opt:
            from jax.flatten_util import ravel_pytree
            flat_gr = ravel_pytree(g_grads)[0]
            flat_p, g_unravel = ravel_pytree(state.g_params)
            g_updates, new_g_opt = self.g_opt_tx.update(flat_gr, state.g_opt,
                                                        flat_p)
            new_g_params = g_unravel(flat_p + g_updates)
        else:
            g_updates, new_g_opt = self.g_opt_tx.update(g_grads, state.g_opt,
                                                        state.g_params)
            new_g_params = jax.tree.map(lambda p, u: p + u, state.g_params,
                                        g_updates)
        metrics["loss_G"] = loss_g
        metrics.update(aux)

        new_d_params, new_d_stats, new_d_opt = (state.d_params,
                                                state.d_stats, state.d_opt)
        # Effective GP gradient weight: the reference backprops the penalty
        # once inside gradient_penalty() and again via loss_D
        # (sradsgan.py:639, :884-887).
        gp_w = cfg.gan.lambda_gp + (1.0 if cfg.gan.gp_inner_backward else 0.0)

        if self.discriminator is not None and shared_fake:
            sr_detached = jax.lax.stop_gradient(sr)

            # ---------------- D update (real + GP; fake grads shared) -----
            def d_real_fn(d_params):
                real_logits, d_stats_real = self.d_apply(
                    d_params, d_stats_fake, hr_img, True)
                loss = -jnp.mean(real_logits.astype(jnp.float32))
                # The reference runs FOUR train-mode D forwards per step
                # (sr, hr, sr.detach(), interp — sradsgan.py:840,877,878,
                # 612), each updating BN running stats.  The shared fake
                # forward covers sr once; replay the second sr EMA update
                # algebraically (updates with identical batch stats b obey
                # r' = m*r2 + (r1 - m*r0) where r1 = m*r0 + (1-m)*b).
                m = 0.9  # BN momentum used across the zoo's discriminators
                stats3 = jax.tree.map(
                    lambda r2, r1, r0: m * r2 + (r1 - m * r0),
                    d_stats_real, d_stats_fake, state.d_stats)
                gp, stats4 = gradient_penalty(
                    lambda x: self.d_apply(d_params, stats3, x, True),
                    hr_img, sr_detached, rng, with_stats=True)
                return loss + gp_w * gp, (stats4, gp)

            ((loss_d_partial, (new_d_stats, gp_val)),
             d_grads_real) = jax.value_and_grad(
                 d_real_fn, has_aux=True)(state.d_params)
            d_grads = jax.tree.map(jnp.add, d_grads_real, d_grads_fake)
            # reported loss matches the reference's logged
            # loss_D = real + fake + lambda_gp*gp (not the 1+lambda grad)
            loss_d = (loss_d_partial - gp_w * gp_val
                      + cfg.gan.lambda_gp * gp_val + mean_fake)
        elif self.discriminator is not None:
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
                gp_val = jnp.float32(0.0)
                if cfg.gan.gan_type == "wgan-gp":
                    gp_val, stats2 = gradient_penalty(
                        lambda x: self.d_apply(d_params, stats2, x, True),
                        hr_img, sr_detached, rng, with_stats=True)
                    loss = loss + gp_w * gp_val
                return loss, (stats2, gp_val)

            ((loss_d_raw, (new_d_stats, gp_val)),
             d_grads) = jax.value_and_grad(
                 d_loss_fn, has_aux=True)(state.d_params)
            loss_d = loss_d_raw - gp_w * gp_val + cfg.gan.lambda_gp * gp_val

        if self.discriminator is not None:
            if self._flat_opt:
                from jax.flatten_util import ravel_pytree
                flat_dr = ravel_pytree(d_grads)[0]
                flat_pd, d_unravel = ravel_pytree(state.d_params)
                d_updates, new_d_opt = self.d_opt_tx.update(
                    flat_dr, state.d_opt, flat_pd)
                new_flat = flat_pd + d_updates
                if cfg.gan.gan_type == "wgan-gp":
                    # weight clip (sradsgan.py:890-892) — every D param,
                    # so the flat clip is the same op in one fusion
                    new_flat = jnp.clip(new_flat, -cfg.gan.clip_value,
                                        cfg.gan.clip_value)
                new_d_params = d_unravel(new_flat)
            else:
                d_updates, new_d_opt = self.d_opt_tx.update(
                    d_grads, state.d_opt, state.d_params)
                new_d_params = jax.tree.map(lambda p, u: p + u,
                                            state.d_params, d_updates)
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
    # Multi-step scan: K train steps per dispatch
    # ------------------------------------------------------------------
    def _multi_step(self, state: GANTrainState, batches, rngs):
        """``lax.scan`` of :meth:`_train_step` over K stacked batches.

        TPU-idiomatic inner loop (cfg.steps_per_call): the scan compiles the
        step body once and runs K steps per host dispatch, amortizing
        dispatch/launch latency — with the remote-relay device of this
        environment that latency is material.  Returns the final state and
        the stacked (K,)-leading metrics.
        """
        def body(st, xs):
            batch, rng = xs
            st, metrics = self._train_step(st, batch, rng)
            return st, metrics

        return jax.lax.scan(body, state, (batches, rngs))

    # ------------------------------------------------------------------
    # Evaluation step (fast on-device PSNR/SSIM vs HR and bicubic twin)
    # ------------------------------------------------------------------
    def _eval_step(self, state: GANTrainState,
                   batch: Dict[str, jnp.ndarray]):
        sr, _ = self.g_apply(state.g_params, state.g_stats, batch["lr"],
                             False)
        sr = sr.astype(jnp.float32)
        out = {
            "psnr": batched_psnr(sr, batch["hr"]),
            "ssim": batched_ssim(sr, batch["hr"]),
            "ergas": batched_ergas(sr, batch["hr"], self.cfg.scale),
            "bc_psnr": batched_psnr(batch["bc"], batch["hr"]),
            "bc_ssim": batched_ssim(batch["bc"], batch["hr"]),
            # first SR of the batch, for TB image summaries (not averaged)
            "sr0": sr[:1],
        }
        if self.cfg.val_lpips:
            # All five reference metrics in the sweep (sradsgan.py:1484-96)
            from sradsgan_tpu.losses.lpips import batched_lpips
            out["lpips"] = batched_lpips(sr, batch["hr"])
            out["bc_lpips"] = batched_lpips(batch["bc"], batch["hr"])
        return out

    # ------------------------------------------------------------------
    # Validation sweep
    # ------------------------------------------------------------------
    def validate(self, max_batches: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        dataset = build_test_dataset(cfg.data, cfg.scale)
        bs = cfg.data.test_batch_size
        loader = DataLoader(dataset, bs, shuffle=False, drop_last=False,
                            num_workers=cfg.data.num_workers)
        # The tail batch is padded up to the bucket size (ONE compiled shape
        # per model — a fresh shape costs minutes of XLA compile here) and
        # the padded rows are masked out of the averages.
        valid_counts: list = []

        def padded():
            for batch in loader:
                batch.pop("path", None)
                n = batch["lr"].shape[0]
                if n < bs:
                    pad = bs - n
                    batch = {k: np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)])
                        for k, v in batch.items()}
                valid_counts.append(n)
                yield batch

        sums: Dict[str, float] = {}
        count = 0
        for i, batch in enumerate(device_prefetch(padded(), self.mesh)):
            if max_batches is not None and i >= max_batches:
                break
            out = self._jit_eval(self.state, batch)
            n = valid_counts[i]
            for k, v in out.items():
                if k == "sr0":
                    continue
                arr = np.asarray(v)[:n]
                sums[k] = sums.get(k, 0.0) + float(arr.sum())
            count += n
        return {k: v / max(count, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------
    # Training loop with plateau backtracking
    # ------------------------------------------------------------------
    def train(self, num_steps: Optional[int] = None) -> Dict[str, float]:
        cfg = self.cfg
        os.makedirs(cfg.model_dir, exist_ok=True)
        dataset = build_train_dataset(cfg.data, cfg.scale)
        rng = jax.random.PRNGKey(cfg.seed + 1)

        # reference-style maxima init (sradsgan.py:795-799: 0 / 0 / 10000)
        best = {"psnr": 0.0, "ssim": 0.0, "ergas": 10000.0}
        best_path = os.path.join(cfg.model_dir, "ckpt_best")
        best_epoch = cfg.start_epoch
        bad_epochs = 0
        step_count = 0
        t0 = time.time()
        last_metrics: Dict[str, float] = {}
        metrics: Dict[str, Any] = {}
        # loss/metric curves (reference plot_loss + avg_* histories,
        # utils/utils.py:55-86, sradsgan.py:1048-1056)
        self.history: Dict[str, list] = {"loss_G": [], "loss_D": [],
                                         "psnr": [], "ssim": [],
                                         "ergas": []}

        # With an explicit num_steps budget the epoch cap is lifted (smoke
        # runs and benchmarking drive by steps, not epochs).
        max_epochs = cfg.num_epochs if num_steps is None else 10 ** 9
        epoch = cfg.start_epoch
        while epoch < max_epochs:
            lr_now = get_lr(self.state.g_opt)
            if lr_now < cfg.optim.lr_floor:  # stop rule (sradsgan.py:804)
                print(f"lr {lr_now:.2e} below floor; stopping")
                break
            loader = DataLoader(dataset, cfg.data.batch_size, shuffle=True,
                                drop_last=True,
                                num_workers=cfg.data.num_workers,
                                seed=cfg.seed + epoch)
            # Clamp the scan length to the epoch length: shorter epochs
            # (tiny datasets) would otherwise yield ZERO full chunks —
            # device_prefetch_stacked drops partial chunks to keep one
            # compiled shape.
            spc = max(1, min(cfg.steps_per_call, len(loader)))

            def _calls():
                """Yields (device payload, host eval batch or None, K).

                In multi-step mode the eval batch stays HOST-side: sharding
                it here would add a duplicate full-batch transfer over this
                environment's ~10 MB/s tunnel every K steps even when no
                sample-interval eval fires in the chunk — it is sharded
                lazily at the eval site instead.
                """
                if spc == 1:
                    for batch in device_prefetch(iter(loader), self.mesh):
                        batch.pop("path", None)
                        yield batch, batch, 1
                else:
                    from sradsgan_tpu.data.loader import \
                        device_prefetch_stacked
                    for stacked, last in device_prefetch_stacked(
                            iter(loader), self.mesh, spc):
                        yield stacked, last, spc

            for payload, eval_batch, k_steps in _calls():
                rng, step_rng = jax.random.split(rng)
                if k_steps == 1:
                    self.state, metrics = self._jit_step(self.state, payload,
                                                         step_rng)
                else:
                    self.state, mk = self._jit_multi_step(
                        self.state, payload,
                        jax.random.split(step_rng, k_steps))
                    metrics = {k: v[-1] for k, v in mk.items()}
                prev_count = step_count
                step_count += k_steps
                if step_count // 50 > prev_count // 50:
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
                        and step_count // cfg.sample_interval
                        > prev_count // cfg.sample_interval):
                    # in-training sample metrics vs the bicubic twin
                    # (reference sradsgan.py:911-969) + TB image summary
                    # (reference utils/logger.py:64-87)
                    if k_steps > 1:  # lazy shard (host batch in scan mode)
                        eval_batch = shard_batch(
                            {k: v for k, v in eval_batch.items()
                             if k != "path"}, self.mesh)
                    q = dict(self._jit_eval(self.state, eval_batch))
                    sr0 = np.asarray(q.pop("sr0"))[0]
                    self.logger.print_format_results(
                        "train", {"epoch": epoch, "step": step_count,
                                  **{k: float(np.mean(np.asarray(v)))
                                     for k, v in q.items()}})
                    self.logger.image_summary(
                        "sample/sr_hr_bicubic",
                        [sr0, np.asarray(eval_batch["hr"])[0],
                         np.asarray(eval_batch["bc"])[0]], step_count)
                if num_steps is not None and step_count >= num_steps:
                    return {k: float(v) for k, v in metrics.items()}

            # epoch end: validate + plateau logic (sradsgan.py:979-1036)
            # + parameter histograms (reference utils/logger.py:89-115)
            flat = np.concatenate(
                [np.asarray(x).ravel()[:2048]
                 for x in jax.tree.leaves(self.state.g_params)])
            self.logger.histo_summary("g_params", flat, step_count)
            if self.state.d_params is not None:
                flat_d = np.concatenate(
                    [np.asarray(x).ravel()[:2048]
                     for x in jax.tree.leaves(self.state.d_params)])
                self.logger.histo_summary("d_params", flat_d, step_count)
            # Full test sweep by default (reference sradsgan.py:979) — the
            # plateau policy must see the same data the reference sees;
            # cfg.val_max_batches caps it for smoke runs only.
            val = self.validate(max_batches=cfg.val_max_batches)
            last_metrics = val
            self.logger.print_format_results("val", {"epoch": epoch, **val})
            for k in ("loss_G", "loss_D"):
                if k in metrics:
                    self.history[k].append(float(metrics[k]))
            for k in ("psnr", "ssim", "ergas"):
                self.history[k].append(val[k])
            # Metric maxima are tracked reference-style: the elif chain means
            # only the FIRST improving metric updates its stored best, and
            # any improvement resets the counter and marks this epoch best
            # (sradsgan.py:986-1003; lpips joins the chain when available).
            improved = True
            if val["psnr"] > best["psnr"]:
                best["psnr"] = val["psnr"]
            elif val["ssim"] > best["ssim"]:
                best["ssim"] = val["ssim"]
            elif val["ergas"] < best["ergas"]:
                best["ergas"] = val["ergas"]
            else:
                improved = False
            if improved:
                bad_epochs = 0
                best_epoch = epoch
                save_pytree(best_path, {"g_params": self.state.g_params,
                                        "g_stats": self.state.g_stats,
                                        "d_params": self.state.d_params})
            else:
                bad_epochs += 1
            if (cfg.optim.step_decay_epochs
                    and (epoch + 1) % cfg.optim.step_decay_epochs == 0):
                new_lr = get_lr(self.state.g_opt) * cfg.optim.step_decay_gamma
                self.state = self.state.replace(
                    g_opt=set_lr(self.state.g_opt, new_lr))

            if (epoch + 1) % cfg.save_epochs == 0:
                self.save_checkpoint(epoch)
            epoch += 1

            if bad_epochs >= cfg.optim.plateau_patience:
                # Plateau backtrack (sradsgan.py:1012-1036): reload the best
                # G, halve the G lr always; halve the D lr only once the
                # PRE-halving lr has dropped below 1e-4 (the reference checks
                # ``self.lr < 0.0001`` before ``self.lr /= 2``); rewind the
                # epoch counter to just after the best epoch and pop the
                # stale metric history.
                if os.path.exists(best_path):
                    prev = restore_pytree(best_path)
                    self.state = self.state.replace(
                        g_params=jax.tree.map(jnp.asarray, prev["g_params"]))
                else:
                    print("plateau: no best checkpoint yet "
                          "(no finite-improvement epoch so far)")
                cur_lr = get_lr(self.state.g_opt)
                self.state = self.state.replace(
                    g_opt=set_lr(self.state.g_opt, cur_lr * 0.5))
                if self.state.d_opt is not None and cur_lr < 1e-4:
                    self.state = self.state.replace(
                        d_opt=set_lr(self.state.d_opt,
                                     get_lr(self.state.d_opt) * 0.5))
                bad_epochs = 0
                print(f"plateau: reloaded best, lr -> {cur_lr * 0.5:.2e}")
                if cfg.optim.plateau_rewind:
                    epoch = best_epoch + 1
                    # the reference pops only the METRIC histories, not the
                    # loss curves (sradsgan.py:1032-1036)
                    for k in ("psnr", "ssim", "ergas"):
                        hist = self.history[k]
                        del hist[len(hist) - min(cfg.optim.plateau_patience,
                                                 len(hist)):]

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
