"""Scene-classification pipeline execution evidence (VERDICT r2 item 7).

Builds a synthetic 8-class UCMerced-style corpus with learnable class
structure, runs the FULL pipeline on the chip (65/10/25 split -> VGG
bottleneck features -> head training -> evaluate() on an SR-output
folder tree), and prints accuracy + runtime.
"""
import json
import os
import time

import numpy as np
from PIL import Image

ROOT = "/tmp/scene_synth/hr"
SR = "/tmp/scene_synth/sr"

def build_corpus(n_classes=8, per_class=30, size=216):
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        os.makedirs(f"{ROOT}/class{c:02d}", exist_ok=True)
        os.makedirs(f"{SR}/class{c:02d}", exist_ok=True)
        base_hue = np.array([c / n_classes, (c * 37 % n_classes) / n_classes,
                             1.0 - c / n_classes])
        freq = 2 + c
        yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                             indexing="ij")
        for i in range(per_class):
            phase = rng.random() * 6.28
            tex = 0.5 + 0.25 * np.sin(2 * np.pi * freq * xx + phase) \
                      + 0.25 * np.cos(2 * np.pi * freq * yy - phase)
            img = np.clip(tex[..., None] * base_hue[None, None]
                          + 0.15 * rng.random((size, size, 3)), 0, 1)
            im = Image.fromarray((img * 255).astype(np.uint8))
            im.save(f"{ROOT}/class{c:02d}/img{i:03d}.png")
            # "SR output": x4 bicubic degrade + re-upsample stand-in
            lr = im.resize((size // 4, size // 4), Image.BICUBIC)
            lr.resize((size, size), Image.BICUBIC).save(
                f"{SR}/class{c:02d}/img{i:03d}.png")

def main():
    build_corpus()
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.tools.scene_classification import SceneClassifier
    t0 = time.time()
    clf = SceneClassifier()
    head = clf.train_head(ROOT)
    t_train = time.time() - t0
    t0 = time.time()
    result = clf.evaluate_folder(SR, save_confusion="/tmp/scene_confusion.png")
    t_eval = time.time() - t0
    print(json.dumps({
        "val_acc": head["val_acc"], "train_loss": head["train_loss"],
        "sr_accuracy": result["accuracy"],
        "pretrained_trunk": clf.pretrained,
        "train_s": round(t_train, 1), "eval_s": round(t_eval, 1),
        "n_classes": 8, "chance": 0.125}))

if __name__ == "__main__":
    main()
