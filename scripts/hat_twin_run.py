"""HAT ×4 bf16-softmax blessing twin (round 5, docs/PERF.md).

The round-5 HAT campaign adopted compute-dtype (bf16) attention softmax
for bf16 models (151.1 vs 179.1 ms/step).  Before blessing the default,
train the SAME seed twice — SRADSGAN_TPU_HAT_SOFTMAX=f32 vs bf16 — and
compare full validate() sweeps, mirroring the bf16-D blessing protocol
(docs/VALIDATION.md rounds 3/5).  Reference trains HAT in f32
(model/hat.py + model/sradsgan.py train loop family).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/hat_twin_run.py [steps]
"""
import json
import os
import sys
import time

import numpy as np


def run_arm(softmax, total_steps, val_at, seed=0):
    import jax

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    from sradsgan_tpu.train.trainer import Trainer

    os.environ["SRADSGAN_TPU_HAT_SOFTMAX"] = softmax
    cfg = config_for_model("hat", 4)
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 256
    cfg.data.crop_size = 216
    cfg.data.test_crop_size = 216
    cfg.data.batch_size = 16
    cfg.data.test_batch_size = 4
    cfg.save_dir = f"/tmp/hat_twin_{softmax}_s{seed}"
    trainer = Trainer(cfg)

    def sweep(step):
        val = trainer.validate(max_batches=8)
        print(json.dumps({"arm": softmax, "step": step,
                          **{k: round(v, 4) for k, v in val.items()}}),
              flush=True)

    ds = build_train_dataset(cfg.data, cfg.scale)
    rng = jax.random.PRNGKey(seed)
    step = 0
    t0 = time.time()
    points = sorted(s for s in val_at if 0 < s <= total_steps)
    while step < total_steps:
        loader = DataLoader(ds, cfg.data.batch_size, shuffle=True,
                            num_workers=cfg.data.num_workers,
                            seed=step + 1000 * seed)
        for batch in device_prefetch(iter(loader), trainer.mesh):
            batch.pop("path", None)
            rng, k = jax.random.split(rng)
            trainer.state, metrics = trainer._jit_step(trainer.state,
                                                       batch, k)
            step += 1
            if points and step == points[0]:
                m = {kk: float(v) for kk, v in metrics.items()}
                assert all(np.isfinite(v) for v in m.values()), (step, m)
                print(json.dumps({"arm": softmax, "step": step,
                                  "elapsed_s": round(time.time() - t0, 1),
                                  **{kk: round(v, 4)
                                     for kk, v in m.items()}}), flush=True)
                sweep(step)
                points.pop(0)
            if step >= total_steps:
                break


def main(total_steps=600, seed=0):
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    val_at = (150, 300, total_steps)
    run_arm("f32", total_steps, val_at, seed)
    run_arm("bf16", total_steps, val_at, seed)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600,
         int(sys.argv[2]) if len(sys.argv) > 2 else 0)
