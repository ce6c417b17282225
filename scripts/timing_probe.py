"""Timing-methodology probe for the remote-relay TPU.

1. A known-FLOPs bf16 matmul chain: if measured TFLOP/s exceeds the v5e
   peak (~197 bf16), block_until_ready is not actually syncing and every
   other timing in this environment is garbage.
2. The flagship g_pixel step timed two ways: block_until_ready vs a host
   fetch of the loss value (device->host copy cannot complete before the
   program does).

Run: PYTHONPATH=... python scripts/timing_probe.py [conv|taps|pallas|
autodiff-taps|autodiff-transpose]   (note: a bare "transpose" arg behaves
as taps — only "autodiff-transpose" triggers the transposed stat layout)
"""

import json
import os
import sys
import time

import numpy as np


def probe_matmul():
    import jax
    import jax.numpy as jnp

    n = 4096
    reps = 8
    a = jnp.asarray(np.random.default_rng(0).random((n, n), np.float32),
                    jnp.bfloat16)

    @jax.jit
    def chain(a):
        x = a
        for _ in range(reps):
            x = jnp.dot(x, a)
            x = x / jnp.max(jnp.abs(x))
        return x

    out = chain(a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    steps = 20
    for _ in range(steps):
        out = chain(out)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / steps
    flops = reps * 2 * n ** 3
    print(json.dumps({"probe": "matmul_block", "ms": round(dt * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 1)}), flush=True)

    t0 = time.perf_counter()
    for _ in range(steps):
        out = chain(out)
    host = float(jnp.sum(out.astype(jnp.float32)))  # host fetch = hard sync
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({"probe": "matmul_fetch", "ms": round(dt * 1e3, 3),
                      "tflops": round(flops / dt / 1e12, 1),
                      "sum": host}), flush=True)


def probe_g_pixel():
    import jax

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.losses import pixel_loss
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    cfg.save_dir = "/tmp/sradsgan_probe"
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = shard_batch({
        "lr": rng.random((16, 54, 54, 3)).astype(np.float32),
        "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
        "bc": rng.random((16, 216, 216, 3)).astype(np.float32),
    }, trainer.mesh)

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
    state = trainer.state
    for _ in range(3):
        state, loss = step(state, batch)
    float(loss)  # host fetch: absorbs compile + warmup (block lies here)

    steps = 30
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    jax.block_until_ready(loss)
    dt_block = (time.perf_counter() - t0) / steps

    float(loss)  # drain anything the (unreliable) block let through
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = step(state, batch)
    val = float(loss)  # host fetch = hard sync
    dt_fetch = (time.perf_counter() - t0) / steps
    print(json.dumps({"probe": "g_pixel",
                      "slam_impl": os.environ.get("SRADSGAN_TPU_SLAM_IMPL",
                                                  "conv"),
                      "ms_block": round(dt_block * 1e3, 2),
                      "ms_fetch": round(dt_fetch * 1e3, 2),
                      "loss": val}), flush=True)


def main():
    if len(sys.argv) > 1:  # taps | conv | transpose | pallas
        os.environ["SRADSGAN_TPU_SLAM_IMPL"] = sys.argv[1]
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    if os.environ.get("PROBE_MATMUL", "") == "1":
        probe_matmul()
    probe_g_pixel()


if __name__ == "__main__":
    main()
