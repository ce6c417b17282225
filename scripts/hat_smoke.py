"""HAT x8 on hardware: compile time + 200-step train smoke + throughput.

Reference config: main_hat.py:31-38 (scale 8, lr 2e-4, batch 16, 216 crops,
embed_dim 96, window 9).  Records compile wall time and MP/s.
"""

import json
import time

import numpy as np


def main(steps: int = 200):
    import jax

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("hat", 8)
    cfg.data.synthetic = True
    cfg.save_dir = "/tmp/hat_smoke"
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = shard_batch({
        "lr": rng.random((16, 27, 27, 3)).astype(np.float32),
        "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
        "bc": rng.random((16, 216, 216, 3)).astype(np.float32),
    }, trainer.mesh)
    key = jax.random.PRNGKey(0)

    t0 = time.perf_counter()
    state, metrics = trainer._jit_step(trainer.state, batch, key)
    float(metrics["loss_G"])  # host fetch = hard sync (block is unreliable)
    compile_s = time.perf_counter() - t0
    print(json.dumps({"hat_compile_s": round(compile_s, 1)}), flush=True)

    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        state, metrics = trainer._jit_step(state, batch, k)
        if (i + 1) % 50 == 0:
            m = {kk: float(v) for kk, v in metrics.items()}
            print(json.dumps({"step": i + 1, **{k2: round(v, 4)
                                                for k2, v in m.items()}}),
                  flush=True)
            assert all(np.isfinite(v) for v in m.values()), m
    jax.block_until_ready(metrics["loss_G"])
    dt = (time.perf_counter() - t0) / steps
    print(json.dumps({
        "hat_ms_per_step": round(dt * 1e3, 2),
        "hat_mps": round(16 * 216 * 216 / 1e6 / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
