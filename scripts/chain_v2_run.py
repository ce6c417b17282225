"""Quality chain training on the 21-class corpus v2 (round 5).

Round 4 executed the reference's x2->x3->x4->x8->x9 chain protocol
(model/sradsgan.py:716-721 strict=False warm start; BASELINE configs[3])
end-to-end on hardware, but only 600 steps/scale on the v1 synthetic
corpus — whose bicubic twin is unbeatable by construction (iid-noise
floor, docs/VALIDATION.md round 5).  This run is the *quality* version:
the corpus-v2 21-class set (sharp rectangles + sub-Nyquist class texture,
scripts/by_class_evidence.py synth_image v=2), more steps per scale, and
a cold ×4 control, so the chain can be shown producing checkpoints that
BEAT bicubic at every scale — the reference's published result — not just
exercising the restore path.

Reuses the exact corpus splits of scripts/corpus21_learning_run.py
(train seed 1234 / test seed 7, disjoint) so tables are comparable with
the round-5 ×4 learning run.

Resumable (round 5): the first two executions of this run were lost to
container restarts that wiped /tmp, so all outputs (per-run curves,
checkpoints, the XLA compile cache) now live under /root/repo/.chain_v2
which survives restarts; a completed scale is skipped on relaunch via its
``<tag>.done.json`` marker (curve + checkpoint path inside).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/chain_v2_run.py [steps_per_scale]
"""
import json
import os
import sys
import time

PERSIST = "/root/repo/.chain_v2"


def run_one(scale, steps, val_at, init_from=None, tag=None):
    tag = tag or f"x{scale}"
    marker = os.path.join(PERSIST, f"{tag}.done.json")
    if os.path.exists(marker):
        with open(marker) as f:
            done = json.load(f)
        print(json.dumps({"tag": tag, "resumed": True,
                          "ckpt": done["ckpt"]}), flush=True)
        return done["ckpt"], done["curve"]
    return _run_one(scale, steps, val_at, init_from, tag, marker)


def _run_one(scale, steps, val_at, init_from, tag, marker):
    import jax
    import numpy as np

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", scale)
    cfg.data.data_dir = "/tmp/ucm21"
    cfg.data.train_datasets = ("TRAIN",)
    cfg.data.test_dataset = "UCMerced"
    cfg.data.synthetic = False
    cfg.data.crop_size = 216
    cfg.data.test_crop_size = 216
    cfg.data.batch_size = 16
    cfg.data.test_batch_size = 4
    cfg.save_dir = os.path.join(PERSIST, tag)
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
    with open(marker, "w") as f:
        json.dump({"ckpt": ckpt, "curve": curve}, f)
    return ckpt, curve


def main(steps=1500):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from by_class_evidence import build_corpus
    from corpus21_learning_run import build_train_split

    build_corpus()          # test split: /tmp/ucm21/UCMerced (seed 7)
    build_train_split()     # train split: /tmp/ucm21/TRAIN (seed 1234)

    os.environ.setdefault("SRADSGAN_TPU_COMPILE_CACHE",
                          os.path.join(PERSIST, "xla_cache"))
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    os.makedirs(PERSIST, exist_ok=True)
    val_at = tuple(sorted({150, 300, 600, 1000, steps // 2, steps}))

    results = {}
    ckpt, results["x2"] = run_one(2, steps, val_at)
    print(json.dumps({"chain": "x2 -> x3 (upsample tail re-inits)"}),
          flush=True)
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
    ckpt9, results["x9_warm"] = run_one(9, steps, val_at, init_from=ckpt8)

    results["checkpoints"] = {"x3": ckpt3, "x4": ckpt4, "x8": ckpt8,
                              "x9": ckpt9}
    out = os.path.join(PERSIST, "curves.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print("curves: " + out, flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1500)
