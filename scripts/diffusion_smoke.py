"""Diffusion (GDP) on hardware: train-step timing + 1000-step sampler timing.

Matches the reference gdp_train_27_216.json shape (27 -> 216, batch 4, UNet
inner 64, mults (1,2,4,8), T=1000; GDP_x0/config/gdp_train_27_216.json).
"""

import json
import time

import numpy as np


def main():
    import jax

    from sradsgan_tpu.core.config import DataConfig
    from sradsgan_tpu.diffusion.trainer import DiffusionTrainer
    from sradsgan_tpu.parallel.mesh import shard_batch

    cfg = DataConfig(synthetic=True, synthetic_size=8, crop_size=216,
                     batch_size=4, num_workers=2)
    trainer = DiffusionTrainer(cfg, scale=8, save_dir="/tmp/gdp_smoke",
                               n_timestep=1000)
    rng = np.random.default_rng(0)
    batch = shard_batch({
        "HR": (2 * rng.random((4, 216, 216, 3)) - 1).astype(np.float32),
        "SR": (2 * rng.random((4, 216, 216, 3)) - 1).astype(np.float32),
    }, trainer.mesh)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    params, opt, loss = trainer._jit_train(trainer.params, trainer.opt_state,
                                           batch, key)
    float(loss)  # host fetch = hard sync
    print(json.dumps({"gdp_train_compile_s":
                      round(time.perf_counter() - t0, 1)}), flush=True)

    steps = 50
    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        params, opt, loss = trainer._jit_train(params, opt, batch, k)
    # host fetch closes the timed region (block_until_ready is unreliable
    # through the remote relay — docs/VALIDATION.md round-2 finding)
    final = float(loss)
    dt = (time.perf_counter() - t0) / steps
    assert np.isfinite(final), final
    print(json.dumps({"gdp_train_ms_per_step": round(dt * 1e3, 2),
                      "gdp_train_it_per_s": round(1 / dt, 2),
                      "loss": float(loss)}), flush=True)
    trainer.params = params

    # 1000-step ancestral sampler (reference hot loop diffusion.py:207-237)
    bc = rng.random((1, 216, 216, 3)).astype(np.float32)
    t0 = time.perf_counter()
    sr = trainer.super_resolution(bc)
    compile_plus_run = time.perf_counter() - t0
    assert np.all(np.isfinite(sr))
    t0 = time.perf_counter()
    sr = trainer.super_resolution(bc)
    run_s = time.perf_counter() - t0
    print(json.dumps({
        "gdp_sampler_compile_plus_run_s": round(compile_plus_run, 1),
        "gdp_sampler_1000step_s": round(run_s, 2),
        "gdp_sampler_steps_per_s": round(1000 / run_s, 1)}), flush=True)


if __name__ == "__main__":
    main()
