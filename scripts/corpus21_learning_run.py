"""Flagship 3000-step run on the 21-class corpus, 5-metric sweeps, plus a
quality checkpoint for validate-by-class (VERDICT r4 item 3).

Round 4's committed by-class table came from a 600-step checkpoint trained
on a DIFFERENT corpus (the multi-band synthetic set), so SR lost to
bicubic in every class.  The reference's published-table path exists to
show SR *winning* (model/sradsgan.py:1393-1601).  This script:

1. builds the SAME 21-class held-out test corpus round 4 used
   (by_class_evidence.build_corpus, seed 7 — so tables are directly
   comparable) plus a disjoint TRAIN split from the same generative
   family (different seed and phases, 24 images/class);
2. trains SRADSGAN x4 (full size, blessed bf16-D default, WGAN-GP + VGG
   content + L1, batch 16 of 216^2 crops) for 3000 steps with
   cfg.val_lpips=True — the reference's FIVE metrics
   (MSE/PSNR/SSIM/ERGAS/LPIPS, sradsgan.py:1484-1496) at every sweep;
3. saves the checkpoint for scripts/by_class_evidence.py.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/corpus21_learning_run.py [steps]
"""
import json
import os
import sys
import time

import numpy as np


def build_train_split(per_class=24, size=216, v=2):
    """Disjoint train images from the test corpus's generative family
    (same class-conditional distribution, different seed/instances)."""
    from PIL import Image

    from by_class_evidence import UCM_CLASSES, synth_image

    rng = np.random.default_rng(1234)  # test corpus uses seed 7
    root = "/tmp/ucm21/TRAIN"
    for ci, name in enumerate(UCM_CLASSES):
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        for i in range(per_class):
            img = synth_image(rng, ci, size, v=v)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(d, f"{name}{i:02d}.png"))
    return root


def main(total_steps=3000, val_at=(0, 250, 500, 1000, 1500, 2000, 3000),
         init_from=None, lr=None, save_dir="/tmp/sradsgan_corpus21"):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from by_class_evidence import build_corpus

    build_corpus()          # test split: /tmp/ucm21/UCMerced (seed 7)
    build_train_split()     # train split: /tmp/ucm21/TRAIN (seed 1234)

    import jax

    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", 4)
    cfg.val_lpips = True    # 5-metric sweeps (sradsgan.py:1484-1496)
    cfg.data.data_dir = "/tmp/ucm21"
    cfg.data.train_datasets = ("TRAIN",)
    cfg.data.test_dataset = "UCMerced"
    cfg.data.synthetic = False
    cfg.data.crop_size = 216
    cfg.data.test_crop_size = 216
    cfg.data.batch_size = 16
    cfg.data.test_batch_size = 4
    cfg.save_dir = save_dir
    if init_from:
        # continuation at decayed lr — the reference's step-decay protocol
        # (model/sradsgan.py lr schedule); optimizer state restarts fresh.
        cfg.init_from = init_from
    if lr is not None:
        cfg.optim.lr = lr
    print(json.dumps({"config": "sradsgan_x4 on 21-class corpus",
                      "d_bf16": cfg.d_bf16, "val_lpips": True,
                      "init_from": init_from, "lr": cfg.optim.lr,
                      "steps": total_steps}), flush=True)
    trainer = Trainer(cfg)

    def sweep(step):
        val = trainer.validate(max_batches=16)
        print(json.dumps({"step": step,
                          **{k: round(v, 4) for k, v in val.items()}}),
              flush=True)

    sweep(0)
    ds = build_train_dataset(cfg.data, cfg.scale)
    rng = jax.random.PRNGKey(0)
    step = 0
    t0 = time.time()
    val_points = sorted(s for s in val_at if 0 < s <= total_steps)
    while step < total_steps:
        loader = DataLoader(ds, cfg.data.batch_size, shuffle=True,
                            num_workers=cfg.data.num_workers, seed=step)
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
    kw = {}
    for a in sys.argv[2:]:
        key, _, val = a.partition("=")
        if key == "init_from":
            kw["init_from"] = val
        elif key == "lr":
            kw["lr"] = float(val)
        elif key == "save_dir":
            kw["save_dir"] = val
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 3000, **kw)
