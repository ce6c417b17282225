"""Host-side datasets: folder scan + PIL degradation triplets.

Reproduces the reference pipeline exactly where metrics depend on it:

- train (reference data/dataset.py:386-441): HR = the 216x216 image as-is;
  LR = PIL BICUBIC downsample; bicubic twin = LR re-upsampled BICUBIC.
- test (reference data/data.py:317-346): LR = torchvision Resize default =
  PIL BILINEAR downsample; bicubic twin = that LR re-upsampled BICUBIC;
  HR = image as-is; class subfolders sorted (UCMerced layout).
- optional augmentation (random rotate/flip) is implemented but OFF by
  default — the reference stores the flags but never applies them in its
  RGB dataset classes.

A deterministic synthetic dataset stands in when no image corpus is mounted
(tests, benchmarking): smooth low-frequency patterns so SR is learnable.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff")


def is_image_file(name: str) -> bool:
    return name.lower().endswith(IMG_EXTENSIONS)


def scan_image_dirs(dirs: Sequence[str]) -> List[str]:
    files: List[str] = []
    for d in dirs:
        files.extend(os.path.join(d, x) for x in sorted(os.listdir(d))
                     if is_image_file(x))
    return files


def scan_class_dirs(root: str) -> List[Tuple[str, str]]:
    """Sorted (class_name, class_dir) pairs — UCMerced layout
    (reference data/data.py:321-327)."""
    out = []
    for name in sorted(os.listdir(root)):
        path = os.path.join(root, name)
        if os.path.isdir(path):
            out.append((name, path))
    return out


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w == size and h == size:
        return img
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def make_triplet(img: Image.Image, scale: int, crop_size: int,
                 lr_filter: str = "bicubic"):
    """(lr, hr, bc) float32 HWC triplet with the reference's PIL protocol."""
    img = _center_crop(img.convert("RGB"), crop_size)
    lr_size = crop_size // scale
    resample = Image.BICUBIC if lr_filter == "bicubic" else Image.BILINEAR
    lr_img = img.resize((lr_size, lr_size), resample)
    bc_img = lr_img.resize((crop_size, crop_size), Image.BICUBIC)
    to_f32 = lambda im: np.asarray(im, dtype=np.float32) / 255.0
    return to_f32(lr_img), to_f32(img), to_f32(bc_img)


@dataclasses.dataclass
class FolderDataset:
    """Triplet dataset over image files."""

    files: List[str]
    scale: int
    crop_size: int = 216
    lr_filter: str = "bicubic"   # 'bilinear' for the test protocol
    augment: bool = False

    def __len__(self) -> int:
        return len(self.files)

    def load(self, index: int, rng: Optional[np.random.Generator] = None):
        img = Image.open(self.files[index])
        if self.augment and rng is not None:
            k = int(rng.integers(0, 4))
            img = img.rotate(90 * k)
            if rng.integers(0, 2):
                img = img.transpose(Image.FLIP_LEFT_RIGHT)
            if rng.integers(0, 2):
                img = img.transpose(Image.FLIP_TOP_BOTTOM)
        lr, hr, bc = make_triplet(img, self.scale, self.crop_size,
                                  self.lr_filter)
        return {"lr": lr, "hr": hr, "bc": bc, "path": self.files[index]}


@dataclasses.dataclass
class SyntheticDataset:
    """Deterministic smooth random images (no corpus required)."""

    size: int
    scale: int
    crop_size: int = 216
    lr_filter: str = "bicubic"
    seed: int = 1234

    def __len__(self) -> int:
        return self.size

    def load(self, index: int, rng=None):
        g = np.random.default_rng(self.seed + index)
        low = g.random((9, 9, 3)).astype(np.float32)
        img = Image.fromarray(
            (np.clip(low, 0, 1) * 255).astype(np.uint8)).resize(
                (self.crop_size, self.crop_size), Image.BICUBIC)
        # add mild high-frequency texture so SR has something to learn
        arr = np.asarray(img, np.float32) / 255.0
        noise = g.normal(0, 0.02, arr.shape).astype(np.float32)
        arr = np.clip(arr + noise, 0, 1)
        img = Image.fromarray((arr * 255).astype(np.uint8))
        lr, hr, bc = make_triplet(img, self.scale, self.crop_size,
                                  self.lr_filter)
        return {"lr": lr, "hr": hr, "bc": bc, "path": f"synthetic_{index}"}


def build_train_dataset(cfg, scale: int):
    """Reference get_RGB_trainDataset (data/data.py:295-315): one dir per
    class of AID/DOTA/LoveDA/RSSCN7_2800 plus the SECOND root."""
    if cfg.synthetic:
        return SyntheticDataset(cfg.synthetic_size, scale, cfg.crop_size)
    dirs: List[str] = []
    for dataset in cfg.train_datasets:
        root = os.path.join(cfg.data_dir, dataset)
        if not os.path.isdir(root):
            continue
        if dataset == "SECOND":
            dirs.append(root)
        else:
            dirs.extend(p for _, p in scan_class_dirs(root))
    files = scan_image_dirs(dirs)[:cfg.max_train_samples]
    if not files:
        raise FileNotFoundError(
            f"no training images under {cfg.data_dir} for "
            f"{cfg.train_datasets}; set data.synthetic=True for synthetic "
            "data")
    return FolderDataset(files, scale, cfg.crop_size, "bicubic")


def build_test_dataset(cfg, scale: int, class_dirs=None):
    """Reference get_RGB_testDataset: sorted class dirs, bilinear LR."""
    if cfg.synthetic:
        return SyntheticDataset(max(cfg.synthetic_size // 8, 8), scale,
                                cfg.test_crop_size, lr_filter="bilinear",
                                seed=99)
    if class_dirs is None:
        root = os.path.join(cfg.data_dir, cfg.test_dataset)
        class_dirs = [p for _, p in scan_class_dirs(root)]
    files = scan_image_dirs(class_dirs)
    if not files:
        raise FileNotFoundError(f"no test images under {class_dirs}")
    return FolderDataset(files, scale, cfg.test_crop_size,
                         lr_filter="bilinear")
