"""600-step full-size flagship stability + throughput: f32 D vs bf16 D.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/stability_bf16d.py
"""

import json
import time

import numpy as np


def run(d_bf16: bool, steps: int = 600):
    import jax

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    cfg.d_bf16 = d_bf16
    cfg.save_dir = "/tmp/sradsgan_stab"
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    batches = []
    for i in range(4):  # rotate a few batches so BN stats move realistically
        batches.append(shard_batch({
            "lr": rng.random((16, 54, 54, 3)).astype(np.float32),
            "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
            "bc": rng.random((16, 216, 216, 3)).astype(np.float32),
        }, trainer.mesh))
    key = jax.random.PRNGKey(0)
    state = trainer.state
    # warmup/compile
    key, k = jax.random.split(key)
    state, metrics = trainer._jit_step(state, batches[0], k)
    float(metrics["loss_G"])  # host fetch = hard sync
    t0 = time.perf_counter()
    for i in range(steps):
        key, k = jax.random.split(key)
        state, metrics = trainer._jit_step(state, batches[i % 4], k)
        if (i + 1) % 100 == 0:
            m = {kk: float(v) for kk, v in metrics.items()}
            ok = all(np.isfinite(v) for v in m.values())
            print(json.dumps({"d_bf16": d_bf16, "step": i + 1, "ok": ok,
                              **{kk: round(v, 4) for kk, v in m.items()}}),
                  flush=True)
            if not ok:
                return None
    float(metrics["loss_G"])  # host fetch = hard sync
    dt = (time.perf_counter() - t0) / steps
    mps = 16 * 216 * 216 / 1e6 / dt
    print(json.dumps({"d_bf16": d_bf16, "ms_per_step": round(dt * 1e3, 2),
                      "mps": round(mps, 2)}), flush=True)
    return mps


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["f32", "bf16"]
    if "bf16" in which:
        run(True)
    if "f32" in which:
        run(False)
