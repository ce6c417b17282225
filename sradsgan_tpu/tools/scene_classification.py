"""Downstream scene-classification evaluation of SR outputs.

Reference: Scene_classification_mfe.py (479 LoC): 65/10/25 train/val/test
split of UCMerced (:48-85), frozen VGG16 bottleneck features (:121-237), a
Dense(256) -> Dense(21, softmax) head (:239-312), and ``evaluate()`` scoring
accuracy + confusion matrices on SR output folders (:314-505) — i.e. SR
quality is also judged by land-use classification accuracy.

The trunk is the reference's own architecture: VGG16 bottleneck features
(losses/lpips.py VGG16Features — the conv stack of Keras
``VGG16(include_top=False)``), with the block5 output max-pooled once more
(Keras block5_pool) and flattened, exactly the feature the reference's
Dense head consumes.  Load converted torchvision VGG16 weights via
SRADSGAN_TPU_VGG16_NPZ (the same hook the LPIPS vgg trunk uses) for
pretrained features; otherwise a fixed-seed random trunk is used (random
conv features + trained linear head is a valid, self-consistent downstream
metric, though absolute accuracies differ from the Keras-VGG16 numbers).
The head trains with optax on device.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
import optax

from sradsgan_tpu.data.datasets import scan_class_dirs, scan_image_dirs
from sradsgan_tpu.losses.lpips import VGG16_WEIGHTS_ENV, VGG16Features, \
    _nest_npz


def nn_max_pool(x):
    """2x2/2 max pool (Keras block5_pool semantics)."""
    from flax import linen as nn
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def split_dataset(root: str, train_frac: float = 0.65,
                  val_frac: float = 0.10, seed: int = 0):
    """Per-class 65/10/25 split (reference :48-85)."""
    rng = np.random.default_rng(seed)
    splits = {"train": [], "val": [], "test": []}
    classes = []
    for label, (name, path) in enumerate(scan_class_dirs(root)):
        classes.append(name)
        files = scan_image_dirs([path])
        idx = rng.permutation(len(files))
        n_train = int(len(files) * train_frac)
        n_val = int(len(files) * val_frac)
        for j in idx[:n_train]:
            splits["train"].append((files[j], label))
        for j in idx[n_train:n_train + n_val]:
            splits["val"].append((files[j], label))
        for j in idx[n_train + n_val:]:
            splits["test"].append((files[j], label))
    return splits, classes


class SceneClassifier:
    def __init__(self, image_size: int = 216, feature_batch: int = 32,
                 seed: int = 0):
        self.image_size = image_size
        self.feature_batch = feature_batch
        self.trunk = VGG16Features()
        self.trunk_params = self.trunk.init(
            jax.random.PRNGKey(7),
            jnp.zeros((1, image_size, image_size, 3)))["params"]
        path = os.environ.get(VGG16_WEIGHTS_ENV)
        self.pretrained = bool(path and os.path.exists(path))
        if self.pretrained:
            loaded = _nest_npz(np.load(path))
            merged = dict(self.trunk_params)
            merged.update(loaded)
            self.trunk_params = merged

        def bottleneck(x):
            # relu5_3 -> 2x2 max pool (Keras block5_pool), flattened: the
            # exact feature the reference's Dense head consumes (:121-237)
            tap = self.trunk.apply({"params": self.trunk_params}, x)[-1]
            pooled = nn_max_pool(tap)
            return pooled.reshape(pooled.shape[0], -1)

        self._feat = jax.jit(bottleneck)
        self.head = None
        self.seed = seed

    # ------------------------------------------------------------------
    def features(self, files: List[str]) -> np.ndarray:
        feats = []
        for i in range(0, len(files), self.feature_batch):
            chunk = files[i:i + self.feature_batch]
            imgs = np.stack([
                np.asarray(
                    Image.open(f).convert("RGB").resize(
                        (self.image_size, self.image_size), Image.BICUBIC),
                    np.float32) / 255.0 for f in chunk])
            feats.append(np.asarray(self._feat(jnp.asarray(imgs))))
        return np.concatenate(feats) if feats else np.zeros((0, 256))

    # ------------------------------------------------------------------
    def train_head(self, root: str, num_classes: Optional[int] = None,
                   epochs: int = 50, lr: float = 1e-3) -> Dict[str, float]:
        splits, classes = split_dataset(root)
        self.classes = classes
        num_classes = num_classes or len(classes)

        def feats_labels(split):
            files = [f for f, _ in splits[split]]
            labels = np.array([l for _, l in splits[split]], np.int32)
            return self.features(files), labels

        x_train, y_train = feats_labels("train")
        x_val, y_val = feats_labels("val")
        dim = x_train.shape[-1]

        key = jax.random.PRNGKey(self.seed)
        k1, k2 = jax.random.split(key)
        params = {
            "w1": jax.random.normal(k1, (dim, 256)) * (1.0 / np.sqrt(dim)),
            "b1": jnp.zeros((256,)),
            "w2": jax.random.normal(k2, (256, num_classes)) * 0.0625,
            "b2": jnp.zeros((num_classes,)),
        }
        tx = optax.adam(lr)
        opt = tx.init(params)

        def logits_fn(p, x):
            h = jax.nn.relu(x @ p["w1"] + p["b1"])
            return h @ p["w2"] + p["b2"]

        @jax.jit
        def step(p, opt, x, y):
            def loss_fn(p):
                logits = logits_fn(p, x)
                return jnp.mean(
                    optax.softmax_cross_entropy_with_integer_labels(
                        logits, y))
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, loss

        xt = jnp.asarray(x_train)
        yt = jnp.asarray(y_train)
        for _ in range(epochs):
            params, opt, loss = step(params, opt, xt, yt)
        self.head = params
        self._logits = jax.jit(lambda x: logits_fn(params, x))

        val_acc = float(np.mean(
            np.argmax(np.asarray(self._logits(jnp.asarray(x_val))), -1)
            == y_val)) if len(y_val) else float("nan")
        return {"train_loss": float(loss), "val_acc": val_acc}

    # ------------------------------------------------------------------
    def evaluate_folder(self, sr_root: str,
                        save_confusion: Optional[str] = None):
        """Accuracy over an SR-output folder tree (class subdirs)
        (reference evaluate(), :314-505)."""
        assert self.head is not None, "call train_head first"
        y_true, y_pred = [], []
        for label, (name, path) in enumerate(scan_class_dirs(sr_root)):
            files = scan_image_dirs([path])
            if not files:
                continue
            feats = self.features(files)
            preds = np.argmax(np.asarray(self._logits(jnp.asarray(feats))),
                              -1)
            y_true.extend([label] * len(files))
            y_pred.extend(preds.tolist())
        y_true = np.asarray(y_true)
        y_pred = np.asarray(y_pred)
        acc = float(np.mean(y_true == y_pred)) if len(y_true) else float("nan")
        n = int(max(y_true.max(), y_pred.max())) + 1 if len(y_true) else 0
        cm = np.zeros((n, n), np.int32)
        for t, p in zip(y_true, y_pred):
            cm[t, p] += 1
        if save_confusion and n:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            fig, ax = plt.subplots(figsize=(8, 7))
            ax.imshow(cm, cmap="Blues")
            ax.set_xlabel("predicted")
            ax.set_ylabel("true")
            ax.set_title(f"accuracy {acc:.4f}")
            fig.tight_layout()
            fig.savefig(save_confusion, dpi=110)
            plt.close(fig)
        return {"accuracy": acc, "confusion": cm.tolist()}


def main(argv=None) -> int:
    import argparse
    parser = argparse.ArgumentParser(
        description="Scene-classification eval of SR outputs")
    parser.add_argument("--hr-root", required=True,
                        help="UCMerced-style HR root (class subdirs)")
    parser.add_argument("--sr-root", required=True,
                        help="SR output root (class subdirs)")
    parser.add_argument("--out", default="scene_classification.json")
    args = parser.parse_args(argv)

    clf = SceneClassifier()
    head = clf.train_head(args.hr_root)
    result = clf.evaluate_folder(
        args.sr_root, save_confusion=args.out.replace(".json", ".png"))
    out = {"head": head, "sr_accuracy": result["accuracy"],
           "pretrained_trunk": clf.pretrained}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
