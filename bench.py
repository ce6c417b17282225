"""Benchmark: SRADSGAN x4 GAN training throughput in megapixels/sec/chip.

Measures the full jitted train step (G fwd/bwd + VGG content + D update with
WGAN-GP grad-of-grad + weight clip) on real hardware, batch 16 of 216x216 HR
crops — the reference's published training configuration
(main_sradsgan.py:31-43, DataLoader batch_size=16 at sradsgan.py:643-652).

Baseline: the reference repo publishes no machine-readable numbers
(BASELINE.md); the denominator is an estimate of its single-GPU training
throughput on the paper-era setup (PyTorch 1.8.1 / CUDA 11.1, one 2080Ti-class
GPU, README.md:91): ~1.5 it/s x 16 x 216^2 px ~= 1.1 MP/s.  Full derivation
(step FLOPs from XLA cost analysis x a charitable 73%-of-f32-peak GPU rate;
the printed multiple is a lower bound): BASELINE.md "Derivation of the
1.1 MP/s reference-GPU estimate".

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

REFERENCE_MPS = 1.1  # estimated reference single-GPU throughput (see above)


def main():
    import jax

    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    cfg.data.crop_size = 216
    cfg.data.batch_size = 16
    cfg.save_dir = "/tmp/sradsgan_tpu_bench"
    trainer = Trainer(cfg)

    rng = np.random.default_rng(0)
    batch = shard_batch({
        "lr": rng.random((16, 54, 54, 3)).astype(np.float32),
        "hr": rng.random((16, 216, 216, 3)).astype(np.float32),
        "bc": rng.random((16, 216, 216, 3)).astype(np.float32),
    }, trainer.mesh)
    steps = 100
    warmup = 2
    # Pre-split and pre-transfer the per-step PRNG keys so the loop body is
    # exactly one dispatch per train step (a jax.random.split per step is
    # its own tiny device program; measured neutral through this relay but
    # pointless work inside a timed window).
    keys = [jax.device_put(k) for k in
            np.asarray(jax.random.split(jax.random.PRNGKey(0),
                                         steps + warmup))]

    state = trainer.state
    # warmup / compile — must END with a host fetch: block_until_ready can
    # return early through this environment's device relay, letting compile
    # tail leak into the timed window (CLAUDE.md timing rule)
    for i in range(warmup):
        state, metrics = trainer._jit_step(state, batch, keys[i])
    float(metrics["loss_G"])

    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = trainer._jit_step(state, batch, keys[warmup + i])
    # Host-fetch ONE scalar of the last step INSIDE the timed region:
    # through this environment's remote-device relay, block_until_ready can
    # return early (scripts/timing_probe.py measured a matmul chain at an
    # impossible 44 PFLOP/s with block-only timing); a device->host value
    # transfer is the only hard synchronization.  The steps chain through
    # the donated train state, so one value bounds the whole sequence.
    # Exactly one: each float() is a sequential relay round-trip, and
    # fetching all 5 metrics here cost 4.7 ms/step amortized over a 30-step
    # window (91.7 vs 87.0 ms/step, /tmp probe, round 3).
    loss_g = float(metrics["loss_G"])
    dt = time.perf_counter() - t0
    final = {k: float(v) for k, v in metrics.items()}  # outside the window
    assert np.isfinite(loss_g) and all(
        np.isfinite(v) for v in final.values()), (
        f"non-finite training metrics in benchmark: {final}")

    n_chips = trainer.mesh.devices.size
    mps_per_chip = steps * 16 * 216 * 216 / 1e6 / dt / n_chips
    print(json.dumps({
        "metric": "sradsgan_x4_train_throughput",
        "value": round(mps_per_chip, 3),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps_per_chip / REFERENCE_MPS, 2),
    }))


if __name__ == "__main__":
    main()
