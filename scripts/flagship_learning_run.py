"""Flagship GAN learning evidence (VERDICT r2 item 2).

Trains SRADSGAN x4 (full size, reference config: WGAN-GP + VGG content +
L1, batch 16, 216² HR) on the synthetic multi-band corpus for several
thousand steps on the real chip, running the real validate() sweep
periodically — recording SR-vs-bicubic PSNR/SSIM/ERGAS so the GAN recipe
demonstrably IMPROVES images (the reference's in-training validate loop,
model/sradsgan.py:979, 1058-1194).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/flagship_learning_run.py [steps]
"""
import json
import sys
import time

import numpy as np


def main(total_steps=3000, val_at=(0, 250, 500, 1000, 2000, 3000),
         d_bf16=False, seed=0, val_lpips=False):
    import jax

    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", 4)
    cfg.d_bf16 = d_bf16
    cfg.seed = seed
    cfg.val_lpips = val_lpips  # 5-metric sweeps (sradsgan.py:1484-1496)
    print(json.dumps({"config": "sradsgan_x4", "d_bf16": d_bf16,
                      "seed": seed, "val_lpips": val_lpips,
                      "steps": total_steps}), flush=True)
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 256
    cfg.data.crop_size = 216
    cfg.data.test_crop_size = 216
    cfg.data.batch_size = 16
    cfg.data.test_batch_size = 4
    cfg.save_dir = ("/tmp/sradsgan_learning_bf16d" if d_bf16
                    else "/tmp/sradsgan_learning") + \
        (f"_seed{seed}" if seed else "")
    trainer = Trainer(cfg)

    def sweep(step):
        val = trainer.validate(max_batches=16)
        print(json.dumps({"step": step,
                          **{k: round(v, 4) for k, v in val.items()}}),
              flush=True)
        return val

    sweep(0)
    ds = build_train_dataset(cfg.data, cfg.scale)
    rng = jax.random.PRNGKey(seed)
    step = 0
    t0 = time.time()
    val_points = sorted(s for s in val_at if 0 < s <= total_steps)
    while step < total_steps:
        loader = DataLoader(ds, cfg.data.batch_size, shuffle=True,
                            num_workers=cfg.data.num_workers,
                            seed=step)
        for batch in device_prefetch(iter(loader), trainer.mesh):
            batch.pop("path", None)
            rng, k = jax.random.split(rng)
            trainer.state, metrics = trainer._jit_step(trainer.state,
                                                       batch, k)
            step += 1
            if val_points and step == val_points[0]:
                m = {kk: float(v) for kk, v in metrics.items()}
                assert all(np.isfinite(v) for v in m.values()), (step, m)
                print(json.dumps({"step": step, "elapsed_s":
                                  round(time.time() - t0, 1),
                                  **{kk: round(v, 4)
                                     for kk, v in m.items()}}), flush=True)
                sweep(step)
                val_points.pop(0)
            if step >= total_steps:
                break
    ckpt = trainer.save_checkpoint(0)
    print(json.dumps({"checkpoint": ckpt}), flush=True)


if __name__ == "__main__":
    seed = 0
    for a in sys.argv[2:]:
        if a.startswith("seed="):
            seed = int(a.split("=")[1])
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000,
         d_bf16="bf16d" in sys.argv[2:], seed=seed,
         val_lpips="lpips" in sys.argv[2:])
