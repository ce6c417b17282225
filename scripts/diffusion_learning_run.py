"""Diffusion SR learning evidence on hardware (round 3).

The GAN zoo has end-to-end learning evidence (docs/VALIDATION.md); this
closes the same gap for the GDP diffusion recipe: train the conditional
x0-prediction DDPM (reference gdp_train_27_216.json shape: scale 8,
216² HR, batch 4, UNet inner 64, mults 1/2/4/8) on the synthetic corpus
and run the full 1000-step-sampler validate() suite at checkpoints —
recording that sampled-SR quality IMPROVES with training.  The reference
trains 866,800 iters (sr_mfe.py / config); a few thousand steps cannot
reach bicubic parity, so the claim recorded here is monotone improvement
of the sampled output, not parity.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/diffusion_learning_run.py [steps]
"""
import json
import sys
import time

import numpy as np


def main(total_steps=3000, val_at=(0, 500, 1500, 3000)):
    import jax

    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.core.config import DataConfig
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    from sradsgan_tpu.diffusion.trainer import DiffusionTrainer

    data_cfg = DataConfig(synthetic=True, synthetic_size=256, crop_size=216,
                          test_crop_size=216, batch_size=4, num_workers=4)
    trainer = DiffusionTrainer(data_cfg, scale=8,
                               save_dir="/tmp/gdp_learning",
                               n_timestep=1000)
    print(json.dumps({"config": "gdp_x8_216", "steps": total_steps}),
          flush=True)

    def sweep(step):
        val = trainer.validate(max_images=4)
        print(json.dumps({"step": step,
                          **{k: round(v, 4) for k, v in val.items()}}),
              flush=True)
        return val

    # Resume from the last sweep's checkpoint if one exists — the device
    # relay has wedged mid-run before (docs/VALIDATION.md round 3); resume
    # means a killed run costs at most one epoch-aligned segment.
    import os
    ckpt = os.path.join(trainer.save_dir, "gdp_ckpt_latest")
    if os.path.exists(ckpt):  # orbax writes a directory at this path
        trainer.load_checkpoint(ckpt)
        print(json.dumps({"resumed_at": trainer.step}), flush=True)
    else:
        sweep(0)
    ds = build_train_dataset(data_cfg, trainer.scale)
    rng = jax.random.PRNGKey(1 + trainer.step)
    step = trainer.step
    t0 = time.time()
    # Sweep ONLY at epoch boundaries, after the device_prefetch producer
    # thread has drained: a first attempt that ran the 1000-step sampler
    # sweep mid-epoch (concurrent with the producer's device_put stream)
    # wedged after its step-500 sweep — every thread futex-parked, no
    # progress for 25 min through this environment's device relay.  The
    # flagship GAN script sweeps mid-epoch without issue; its validate
    # programs are milliseconds, not multi-second sampler chains.
    epoch_len = (data_cfg.synthetic_size // data_cfg.batch_size)
    total_steps = max(epoch_len, (total_steps // epoch_len) * epoch_len)
    val_points = sorted(
        min(max(epoch_len, (s // epoch_len) * epoch_len), total_steps)
        for s in val_at if 0 < s <= total_steps)
    while step < total_steps:
        loader = DataLoader(ds, data_cfg.batch_size, shuffle=True,
                            num_workers=data_cfg.num_workers, seed=step)
        last_loss = None
        for batch in device_prefetch(iter(loader), trainer.mesh):
            batch.pop("path", None)
            gdp_batch = {"HR": 2.0 * batch["hr"] - 1.0,
                         "SR": 2.0 * batch["bc"] - 1.0}
            rng, k = jax.random.split(rng)
            trainer.params, trainer.opt_state, last_loss = (
                trainer._jit_train(trainer.params, trainer.opt_state,
                                   gdp_batch, k))
            step += 1
            trainer.step = step
            if step >= total_steps:
                break
        # epoch boundary: producer finished, device stream quiet
        if val_points and step >= val_points[0]:
            lv = float(last_loss)
            assert np.isfinite(lv), (step, lv)
            print(json.dumps({"step": step, "loss": round(lv, 5),
                              "elapsed_s": round(time.time() - t0, 1)}),
                  flush=True)
            trainer.save_checkpoint("latest")
            sweep(step)
            while val_points and step >= val_points[0]:
                val_points.pop(0)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000)
