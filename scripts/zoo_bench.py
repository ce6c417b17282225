"""Fill the PERF.md zoo table: full train-step throughput for the model
families not yet measured on hardware (EDSR/SRGAN/DSSR/AMSSRN/SRAGAN),
each at its reference config (SURVEY.md §3.5: batch 16, 216² HR crops, ×4).
Fetch-bounded timing; finite-loss asserted.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/zoo_bench.py [models...]
"""
import json
import sys
import time

import numpy as np


def bench_model(name, steps=50):
    import jax

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    name, _, scale = name.partition(":")  # "model[:scale]", default x4
    scale = int(scale or 4)
    cfg = config_for_model(name, scale)
    cfg.data.synthetic = True
    cfg.data.crop_size = 216
    cfg.data.batch_size = 16
    cfg.save_dir = f"/tmp/zoo_bench_{name}"
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = shard_batch({
        "lr": rng.random((16, 216 // scale, 216 // scale, 3)).astype(np.float32),
        "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
        "bc": rng.random((16, 216, 216, 3)).astype(np.float32),
    }, trainer.mesh)
    # Pre-split keys; close the timed window with ONE scalar fetch (each
    # float() is a sequential relay round-trip — fetching all metrics
    # inside the window cost bench.py 4.7 ms/step over 30 steps, worse
    # over 20; docs/PERF.md "timing-window fix").
    keys = [jax.device_put(k) for k in
            np.asarray(jax.random.split(jax.random.PRNGKey(0), steps + 2))]
    state = trainer.state
    for i in range(2):
        state, metrics = trainer._jit_step(state, batch, keys[i])
    float(metrics["loss_G"])  # fetch closes warmup/compile
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer._jit_step(state, batch, keys[2 + i])
    float(metrics["loss_G"])  # hard sync
    dt = (time.perf_counter() - t0) / steps
    final = {k: float(v) for k, v in metrics.items()}  # outside the window
    assert all(np.isfinite(v) for v in final.values()), (name, final)
    print(json.dumps({"model": name, "ms_per_step": round(dt * 1e3, 1),
                      "mps": round(16 * 216 * 216 / 1e6 / dt, 2),
                      **{k: round(v, 4) for k, v in final.items()}}),
          flush=True)


if __name__ == "__main__":
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    models = sys.argv[1:] or ["edsr", "srgan", "dssr", "amssrn", "sragan"]
    for m in models:
        bench_model(m)
