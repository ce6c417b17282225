"""Chain-training execution evidence (VERDICT r3 item 4).

The reference realizes its x2->x3->x4->x8->x9 chain protocol by loading the
previous scale's weights with ``strict=False`` (commented hook,
model/sradsgan.py:716-721) so the scale-specific upsample tail re-inits while
the trunk warm-starts; BASELINE configs[3] names the chain explicitly.  Here
``cfg.init_from`` + ``core/checkpoint.partial_restore`` is the first-class
equivalent.

This script runs the chain ON HARDWARE with short step budgets:

  x2 cold (N steps)  ->  x3 warm  ->  x4 warm  ->  x8 warm  ->  x9 warm
                                      x4 COLD (control, same seed/corpus)

sweeping SR-vs-bicubic metrics at fixed step counts, so VALIDATION.md can
show (a) the warm start helps early PSNR vs the cold control, (b) the
2^n<->3^n transitions re-initialize the upsample tail (kept/skipped leaf
counts printed by the trainer), and (c) checkpoints flow through
partial_restore end-to-end.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/chain_training_run.py [steps_per_scale]
"""
import json
import os
import sys
import time


def run_one(scale, steps, val_at, init_from=None, tag=None):
    import jax
    import numpy as np

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    from sradsgan_tpu.train.trainer import Trainer

    tag = tag or f"x{scale}"
    cfg = config_for_model("sradsgan", scale)
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 256
    cfg.data.crop_size = 216
    cfg.data.test_crop_size = 216
    cfg.data.batch_size = 16
    cfg.data.test_batch_size = 4
    cfg.save_dir = f"/tmp/sradsgan_chain/{tag}"
    cfg.init_from = init_from
    trainer = Trainer(cfg)

    curve = []

    def sweep(step):
        val = trainer.validate(max_batches=16)
        row = {"tag": tag, "step": step,
               **{k: round(v, 4) for k, v in val.items()}}
        curve.append(row)
        print(json.dumps(row), flush=True)

    sweep(0)
    ds = build_train_dataset(cfg.data, cfg.scale)
    rng = jax.random.PRNGKey(0)
    step = 0
    t0 = time.time()
    points = sorted(s for s in val_at if 0 < s <= steps)
    while step < steps:
        loader = DataLoader(ds, cfg.data.batch_size, shuffle=True,
                            num_workers=cfg.data.num_workers, seed=step)
        for batch in device_prefetch(iter(loader), trainer.mesh):
            batch.pop("path", None)
            rng, k = jax.random.split(rng)
            trainer.state, metrics = trainer._jit_step(trainer.state, batch,
                                                       k)
            step += 1
            if points and step == points[0]:
                points.pop(0)
                sweep(step)
            if step >= steps:
                break
    m = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in m.values()), (tag, m)
    print(json.dumps({"tag": tag, "done": step,
                      "wall_s": round(time.time() - t0, 1), **
                      {k: round(v, 4) for k, v in m.items()}}), flush=True)
    ckpt = trainer.save_checkpoint(0)
    return ckpt, curve


def main(steps=600):
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    os.makedirs("/tmp/sradsgan_chain", exist_ok=True)
    val_at = tuple(sorted({150, 300, 600, steps // 2, steps}))

    results = {}
    ckpt, results["x2"] = run_one(2, steps, val_at)
    print(json.dumps({"chain": "x2 -> x3 (upsample tail re-inits: "
                               "2^n vs 3^n conv widths)"}), flush=True)
    ckpt3, results["x3_warm"] = run_one(3, steps, val_at, init_from=ckpt)
    print(json.dumps({"chain": "x3 -> x4"}), flush=True)
    ckpt4, results["x4_warm"] = run_one(4, steps, val_at, init_from=ckpt3)
    print(json.dumps({"chain": "x4 cold control (same corpus/seed)"}),
          flush=True)
    _, results["x4_cold"] = run_one(4, steps, val_at, tag="x4_cold")
    print(json.dumps({"chain": "x4 -> x8"}), flush=True)
    ckpt8, results["x8_warm"] = run_one(8, steps, val_at, init_from=ckpt4)
    print(json.dumps({"chain": "x8 -> x9 (tail re-inits again)"}),
          flush=True)
    _, results["x9_warm"] = run_one(9, steps, val_at, init_from=ckpt8)

    with open("/tmp/sradsgan_chain/curves.json", "w") as f:
        json.dump(results, f, indent=1)
    print("curves: /tmp/sradsgan_chain/curves.json", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 600)
