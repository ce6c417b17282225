"""Ablation timing of the SRADSGAN x4 train step on the real chip.

Times the full jitted GAN step plus component ablations (gates patched to
identity, D-only, VGG-only) to locate where the ~100 ms/step goes before
optimizing.  Prints one JSON line per variant.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_step.py
"""

import json
import sys
import time

import numpy as np


def build_batch(mesh):
    from sradsgan_tpu.parallel.mesh import shard_batch
    rng = np.random.default_rng(0)
    return shard_batch({
        "lr": rng.random((16, 54, 54, 3)).astype(np.float32),
        "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
        "bc": rng.random((16, 216, 216, 3)).astype(np.float32),
    }, mesh)


def build_trainer():
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.train.trainer import Trainer
    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    cfg.save_dir = "/tmp/sradsgan_profile"
    return Trainer(cfg)


def _fetch(out):
    """Hard sync: device->host copy of one value.  Through this
    environment's remote-device relay, block_until_ready can return before
    execution finishes (scripts/timing_probe.py) — a host fetch cannot."""
    import jax
    import jax.numpy as jnp
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(leaf.astype(jnp.float32)))


def timeit_step(step_fn, state, batch, extra=(), steps=30, warmup=2):
    for _ in range(warmup):
        state, out = step_fn(state, batch, *extra)
    _fetch(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, out = step_fn(state, batch, *extra)
    _fetch(out)
    return (time.perf_counter() - t0) / steps


def report(name, ms):
    print(json.dumps({"variant": name, "ms_per_step": round(ms * 1e3, 2)}),
          flush=True)


def run_full(tag):
    import jax
    trainer = build_trainer()
    batch = build_batch(trainer.mesh)
    key = jax.random.PRNGKey(0)

    def step(state, batch):
        return trainer._jit_step(state, batch, key)

    report(tag, timeit_step(step, trainer.state, batch))


def run_g_pixel(tag):
    import jax
    from sradsgan_tpu.losses import pixel_loss
    trainer = build_trainer()
    batch = build_batch(trainer.mesh)

    def raw(state, batch):
        def loss_fn(p):
            sr, _ = trainer.g_apply(p, state.g_stats, batch["lr"], True)
            return pixel_loss(sr, batch["hr"], "l1")
        loss, grads = jax.value_and_grad(loss_fn)(state.g_params)
        upd, new_opt = trainer.g_opt_tx.update(grads, state.g_opt,
                                               state.g_params)
        new_p = jax.tree.map(lambda a, b: a + b, state.g_params, upd)
        return state.replace(g_params=new_p, g_opt=new_opt), loss

    step = jax.jit(raw, donate_argnums=(0,))
    report(tag, timeit_step(step, trainer.state, batch))


def run_g_fwd(tag):
    import jax
    trainer = build_trainer()
    batch = build_batch(trainer.mesh)

    def raw(state, batch):
        sr, _ = trainer.g_apply(state.g_params, state.g_stats, batch["lr"],
                                False)
        return state, sr

    step = jax.jit(raw)
    report(tag, timeit_step(step, trainer.state, batch))


def run_d_only(tag):
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.losses import adversarial_loss_d, gradient_penalty
    trainer = build_trainer()
    batch = build_batch(trainer.mesh)
    key = jax.random.PRNGKey(0)

    def raw(state, batch, rng):
        sr = batch["bc"]
        hr = batch["hr"]

        def d_loss_fn(d_params):
            real_logits, stats1 = trainer.d_apply(d_params, state.d_stats,
                                                  hr, True)
            fake_logits, stats2 = trainer.d_apply(d_params, stats1, sr, True)
            loss = adversarial_loss_d(real_logits, fake_logits, "wgan-gp")
            gp = gradient_penalty(
                lambda x: trainer.d_apply(d_params, state.d_stats, x,
                                          False)[0], hr, sr, rng)
            return loss + 10.0 * gp, stats2

        (loss, new_stats), grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.d_params)
        upd, new_opt = trainer.d_opt_tx.update(grads, state.d_opt,
                                               state.d_params)
        new_p = jax.tree.map(lambda a, b: a + b, state.d_params, upd)
        new_p = jax.tree.map(lambda p: jnp.clip(p, -0.01, 0.01), new_p)
        return state.replace(d_params=new_p, d_stats=new_stats,
                             d_opt=new_opt), loss

    step = jax.jit(raw, donate_argnums=(0,))
    report(tag, timeit_step(step, trainer.state, batch, extra=(key,)))


def run_vgg_only(tag):
    import jax
    from sradsgan_tpu.losses import pixel_loss
    trainer = build_trainer()
    batch = build_batch(trainer.mesh)

    def raw(state, batch):
        def loss_fn(sr):
            f_sr = trainer.vgg.apply({"params": trainer.vgg_params}, sr)
            f_hr = jax.lax.stop_gradient(
                trainer.vgg.apply({"params": trainer.vgg_params},
                                  batch["hr"]))
            return pixel_loss(f_sr, f_hr, "l1")
        loss, g = jax.value_and_grad(loss_fn)(batch["bc"])
        return state, (loss, g)

    step = jax.jit(raw)
    report(tag, timeit_step(step, trainer.state, batch))


def _identity_call(self, x, *a, **k):
    return x


def patch(cls_name, attr="__call__"):
    import sradsgan_tpu.nn.attention as attention
    cls = getattr(attention, cls_name)
    orig = getattr(cls, attr)
    setattr(cls, attr, _identity_call)
    return (cls, attr, orig)


def unpatch(saved):
    for cls, attr, orig in saved:
        setattr(cls, attr, orig)


def run_full_nogp(tag):
    """Full trainer step with the gradient penalty stubbed out (isolates
    the train-mode grad-of-grad cost)."""
    import jax.numpy as jnp

    import sradsgan_tpu.train.trainer as trainer_mod
    orig = trainer_mod.gradient_penalty

    def stub(d_fn, real, fake, rng, with_stats=False, **kw):
        if with_stats:
            return jnp.float32(0.0), d_fn(real)[1]
        return jnp.float32(0.0)

    trainer_mod.gradient_penalty = stub
    try:
        run_full(tag)
    finally:
        trainer_mod.gradient_penalty = orig


def run_full_novgg(tag):
    import jax
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.train.trainer import Trainer
    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    cfg.gan.weight_content = 0.0
    cfg.save_dir = "/tmp/sradsgan_profile"
    trainer = Trainer(cfg)
    batch = build_batch(trainer.mesh)
    key = jax.random.PRNGKey(0)

    def step(state, batch):
        return trainer._jit_step(state, batch, key)

    report(tag, timeit_step(step, trainer.state, batch))


VARIANTS = {
    "full": run_full,
    "g_pixel": run_g_pixel,
    "g_fwd": run_g_fwd,
    "d_only": run_d_only,
    "vgg_only": run_vgg_only,
    "full_nogp": run_full_nogp,
    "full_novgg": run_full_novgg,
}

ABLATIONS = {
    "g_pixel_noslam": ["SpatialGate"],
    "g_pixel_noclam": ["ChannelGate"],
    "g_pixel_nogates": ["SpatialGate", "ChannelGate"],
    "g_pixel_noglobal": ["SpatialSelfAttention", "ChannelSelfAttention"],
}


def main():
    names = sys.argv[1:] or (list(VARIANTS) + list(ABLATIONS))
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    for name in names:
        t0 = time.time()
        try:
            if name in VARIANTS:
                VARIANTS[name](name)
            elif name in ABLATIONS:
                saved = [patch(c) for c in ABLATIONS[name]]
                try:
                    run_g_pixel(name)
                finally:
                    unpatch(saved)
            else:
                print(f"unknown variant {name}", flush=True)
        except Exception as e:  # keep going; report the failure
            print(json.dumps({"variant": name, "error": repr(e)}), flush=True)
        print(f"# {name} wall {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
