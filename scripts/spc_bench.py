"""Measure steps_per_call (multi-step lax.scan) on the flagship x4 config.

Times K=1 (per-step dispatch) vs K=8 (one dispatch per 8 steps) with
fetch-bounded timing; same math (tests/test_train.py proves equivalence).
"""
import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.parallel.mesh import shard_batch, shard_stacked_batches
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    cfg.data.crop_size = 216
    cfg.data.batch_size = 16
    cfg.save_dir = "/tmp/sradsgan_spc"
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    host = {
        "lr": rng.random((16, 54, 54, 3)).astype(np.float32),
        "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)

    # K=1 baseline
    batch = shard_batch(dict(host), trainer.mesh)
    state = trainer.state
    for _ in range(2):
        key, k = jax.random.split(key)
        state, metrics = trainer._jit_step(state, batch, k)
    float(metrics["loss_G"])
    steps = 32
    t0 = time.perf_counter()
    for _ in range(steps):
        key, k = jax.random.split(key)
        state, metrics = trainer._jit_step(state, batch, k)
    float(metrics["loss_G"])
    dt1 = (time.perf_counter() - t0) / steps
    print(json.dumps({"spc": 1, "ms_per_step": round(dt1 * 1e3, 2),
                      "mps": round(16 * 216 * 216 / 1e6 / dt1, 2)}),
          flush=True)

    # K=8 scan
    K = 8
    stacked = shard_stacked_batches(
        {kk: np.stack([host[kk]] * K) for kk in ("lr", "hr")}, trainer.mesh)
    trainer2 = Trainer(cfg)
    state = trainer2.state
    key, k = jax.random.split(key)
    state, mk = trainer2._jit_multi_step(state, stacked,
                                         jax.random.split(k, K))
    float(mk["loss_G"][-1])
    t0 = time.perf_counter()
    calls = 4
    for _ in range(calls):
        key, k = jax.random.split(key)
        state, mk = trainer2._jit_multi_step(state, stacked,
                                             jax.random.split(k, K))
    final = float(mk["loss_G"][-1])
    dt8 = (time.perf_counter() - t0) / (calls * K)
    assert np.isfinite(final)
    print(json.dumps({"spc": K, "ms_per_step": round(dt8 * 1e3, 2),
                      "mps": round(16 * 216 * 216 / 1e6 / dt8, 2),
                      "loss": final}), flush=True)


if __name__ == "__main__":
    main()
