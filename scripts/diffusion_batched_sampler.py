"""Batched 1000-step diffusion sampler throughput (VERDICT r2 item 5).

The reference samples one image at a time through its 1000-step DDPM loop
(GDP_x0/model/gdp_modules/diffusion.py:207-237, called per test image).
Here the `lax.scan` sampler is batch-agnostic, so one compiled chain
amortizes the per-step UNet dispatch over B conditioners — the batched
number is the serving-relevant one.  Fetch-bounded timing per the repo
rule (CLAUDE.md): a host value fetch closes every timed region.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/diffusion_batched_sampler.py
"""
import json
import time

import numpy as np


def main():
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.core.config import DataConfig
    from sradsgan_tpu.diffusion.trainer import DiffusionTrainer

    cfg = DataConfig(synthetic=True, synthetic_size=8, crop_size=216,
                     batch_size=4, num_workers=2)
    trainer = DiffusionTrainer(cfg, scale=8, save_dir="/tmp/gdp_batched",
                               n_timestep=1000)
    rng = np.random.default_rng(0)

    for batch in (1, 4, 8):
        bc = rng.random((batch, 216, 216, 3)).astype(np.float32)
        sr = trainer.super_resolution(bc)          # compile + warm
        assert np.all(np.isfinite(sr)), batch
        t0 = time.perf_counter()
        sr = trainer.super_resolution(bc)          # np.asarray inside = fetch
        dt = time.perf_counter() - t0
        assert np.all(np.isfinite(sr)), batch
        print(json.dumps({
            "batch": batch,
            "sampler_1000step_s": round(dt, 2),
            "amortized_steps_per_s": round(1000 * batch / dt, 1),
            "images_per_min": round(60 * batch / dt, 2)}), flush=True)


if __name__ == "__main__":
    main()
