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
from typing import List, Optional, Sequence, Tuple

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
                 lr_filter: str = "bicubic", gray: bool = False):
    """(lr, hr, bc) float32 HWC triplet with the reference's PIL protocol.

    ``gray=True`` super-resolves the luma channel only (the reference's
    is_gray/YCbCr path, data/dataset.py:463-465)."""
    img = img.convert("YCbCr").getchannel(0) if gray else img.convert("RGB")
    img = _center_crop(img, crop_size)
    lr_size = crop_size // scale
    resample = Image.BICUBIC if lr_filter == "bicubic" else Image.BILINEAR
    lr_img = img.resize((lr_size, lr_size), resample)
    bc_img = lr_img.resize((crop_size, crop_size), Image.BICUBIC)

    def to_f32(im):
        arr = np.asarray(im, dtype=np.float32) / 255.0
        return arr[..., None] if arr.ndim == 2 else arr

    return to_f32(lr_img), to_f32(img), to_f32(bc_img)


@dataclasses.dataclass
class FolderDataset:
    """Triplet dataset over image files."""

    files: List[str]
    scale: int
    crop_size: int = 216
    lr_filter: str = "bicubic"   # 'bilinear' for the test protocol
    augment: bool = False
    gray: bool = False           # Y-channel-only SR (reference is_gray)

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
                                  self.lr_filter, self.gray)
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
        size = self.crop_size
        # multi-band texture: low/mid/fine random fields + sharp rectangles,
        # so the LR->HR mapping has learnable high-frequency structure
        arr = np.zeros((size, size, 3), np.float32)
        for base, amp in ((7, 0.5), (21, 0.25), (63, 0.12)):
            band = g.random((base, base, 3)).astype(np.float32)
            im = Image.fromarray((band * 255).astype(np.uint8)).resize(
                (size, size), Image.BICUBIC)
            arr += amp * (np.asarray(im, np.float32) / 255.0)
        for _ in range(6):  # sharp-edged rectangles (buildings/roads analog)
            y0, x0 = g.integers(0, size - 8, 2)
            h, w = g.integers(4, max(size // 4, 5), 2)
            arr[y0:y0 + h, x0:x0 + w] = (arr[y0:y0 + h, x0:x0 + w] * 0.4
                                         + g.random(3) * 0.6)
        arr = np.clip(arr + 0.08, 0, 1)
        img = Image.fromarray((arr * 255).astype(np.uint8))
        lr, hr, bc = make_triplet(img, self.scale, self.crop_size,
                                  self.lr_filter)
        return {"lr": lr, "hr": hr, "bc": bc, "path": f"synthetic_{index}"}


@dataclasses.dataclass
class AugmentedCropDataset(FolderDataset):
    """Random-scale + random-crop + rot90/flip training variant.

    Reference data/dataset.py:222-306 (``Dataset``): scale the image by a
    random factor in [0.5, 1], random-crop to crop_size, rotate by a random
    multiple of 90 degrees, random horizontal/vertical flips, then build
    the bicubic LR/bc triplet.
    """

    random_scale: bool = True

    def load(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng(index)
        img = Image.open(self.files[index]).convert("RGB")
        if self.random_scale:
            factor = float(rng.uniform(0.5, 1.0))
            w = max(int(img.width * factor), self.crop_size)
            h = max(int(img.height * factor), self.crop_size)
            img = img.resize((w, h), Image.BICUBIC)
        if img.width > self.crop_size or img.height > self.crop_size:
            left = int(rng.integers(0, img.width - self.crop_size + 1))
            top = int(rng.integers(0, img.height - self.crop_size + 1))
            img = img.crop((left, top, left + self.crop_size,
                            top + self.crop_size))
        k = int(rng.integers(0, 4))
        if k:
            img = img.rotate(90 * k)
        if rng.integers(0, 2):
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        if rng.integers(0, 2):
            img = img.transpose(Image.FLIP_TOP_BOTTOM)
        lr, hr, bc = make_triplet(img, self.scale, self.crop_size,
                                  self.lr_filter)
        return {"lr": lr, "hr": hr, "bc": bc, "path": self.files[index]}


@dataclasses.dataclass
class NoisyDataset(FolderDataset):
    """LR corrupted with Gaussian or salt&pepper noise.

    Reference data/dataset.py:153-220 (``DatasetFromFolder`` with the noise
    helpers at :15-49).
    """

    noise: str = "gaussian"   # 'gaussian' | 'sp' | 'poisson'
    noise_level: float = 0.01

    def load(self, index: int, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng(index)
        out = super().load(index, None)
        lr = out["lr"]
        if self.noise == "gaussian":
            lr = lr + rng.normal(0, self.noise_level,
                                 lr.shape).astype(np.float32)
        elif self.noise == "poisson":
            # Shot noise (reference utils/utils.py:897-905): scale by the
            # next power of two above the number of distinct levels, draw
            # Poisson, rescale.
            vals = 2.0 ** np.ceil(np.log2(max(len(np.unique(lr)), 2)))
            lr = rng.poisson(np.maximum(lr, 0.0) * vals).astype(
                np.float32) / vals
        else:
            u = rng.random(lr.shape[:2] + (1,))
            lr = np.where(u < self.noise_level / 2, 1.0,
                          np.where(u > 1 - self.noise_level / 2, 0.0, lr))
        out["lr"] = np.clip(lr, 0.0, 1.0).astype(np.float32)
        return out


@dataclasses.dataclass
class BlurDegradedDataset(FolderDataset):
    """Gaussian-blur degradation before downsampling.

    Reference data/dataset.py:331-366 (``RandomCropDatasetFromFolder``).
    """

    blur_sigma: float = 1.5

    def load(self, index: int, rng: Optional[np.random.Generator] = None):
        from PIL import ImageFilter
        img = Image.open(self.files[index]).convert("RGB")
        img = _center_crop(img, self.crop_size)
        blurred = img.filter(ImageFilter.GaussianBlur(self.blur_sigma))
        lr_size = self.crop_size // self.scale
        lr_img = blurred.resize((lr_size, lr_size), Image.BICUBIC)
        bc_img = lr_img.resize((self.crop_size, self.crop_size),
                               Image.BICUBIC)
        to_f32 = lambda im: np.asarray(im, dtype=np.float32) / 255.0
        return {"lr": to_f32(lr_img), "hr": to_f32(img),
                "bc": to_f32(bc_img), "path": self.files[index]}


@dataclasses.dataclass
class TripletFolderDataset:
    """Pre-built lr_{l}/hr_{r}/sr_{l}_{r} triplet folders (GDP layout).

    Reference GDP_x0/data/LRHR_dataset.py:9-128 (folder mode) with the
    optional joint random hflip of GDP_x0/data/util.py:74-92.  Values are
    kept in [0, 1] here; the diffusion trainer maps to [-1, 1].

    ``hr_mask=True`` enables the reference's masked-HR mode
    (LRHR_dataset.py:33-40, 99-104, 110): an ``hr_mask_{r}`` sibling folder
    is read per-index and returned under ``"hr_mask"``, flipped jointly
    with the HR/SR pair (the reference augments [SR, HR, Mask] together).
    """

    root: str
    lr_size: int
    hr_size: int
    hflip: bool = False
    hr_mask: bool = False

    def __post_init__(self):
        self.lr_files = scan_image_dirs(
            [os.path.join(self.root, f"lr_{self.lr_size}")])
        self.hr_files = scan_image_dirs(
            [os.path.join(self.root, f"hr_{self.hr_size}")])
        self.sr_files = scan_image_dirs(
            [os.path.join(self.root, f"sr_{self.lr_size}_{self.hr_size}")])
        assert len(self.lr_files) == len(self.hr_files) == len(self.sr_files)
        self.mask_files = None
        if self.hr_mask:
            self.mask_files = scan_image_dirs(
                [os.path.join(self.root, f"hr_mask_{self.hr_size}")])
            assert len(self.mask_files) == len(self.hr_files)

    def __len__(self) -> int:
        return len(self.hr_files)

    def load(self, index: int, rng: Optional[np.random.Generator] = None):
        to_f32 = lambda p: np.asarray(Image.open(p).convert("RGB"),
                                      np.float32) / 255.0
        lr = to_f32(self.lr_files[index])
        hr = to_f32(self.hr_files[index])
        bc = to_f32(self.sr_files[index])
        mask = (to_f32(self.mask_files[index])
                if self.mask_files is not None else None)
        if self.hflip and rng is not None and rng.integers(0, 2):
            lr, hr, bc = lr[:, ::-1], hr[:, ::-1], bc[:, ::-1]
            if mask is not None:
                mask = mask[:, ::-1]
        out = {"lr": np.ascontiguousarray(lr),
               "hr": np.ascontiguousarray(hr),
               "bc": np.ascontiguousarray(bc),
               "path": self.hr_files[index]}
        if mask is not None:
            out["hr_mask"] = np.ascontiguousarray(mask)
        return out


class LMDBTripletDataset:
    """GDP lmdb-mode LRHR triplets (GDP_x0/data/LRHR_dataset.py:18-95).

    Key schema (reference :22-24, :62-76): ``b"length"`` -> count;
    ``hr_{r}_{i:05d}``, ``sr_{l}_{r}_{i:05d}``, ``lr_{l}_{i:05d}`` ->
    encoded image bytes; missing indices are skipped by redrawing a random
    index (reference :78-95).  The lmdb library is optional in this image:
    pass ``env`` (any object with lmdb's ``begin()`` transaction interface
    — tests use a dict-backed fake) or a path, which is opened with the
    real lmdb behind an import guard.
    """

    def __init__(self, root_or_env, lr_size: int, hr_size: int,
                 data_len: int = -1, need_lr: bool = True,
                 hflip: bool = False):
        if isinstance(root_or_env, (str, os.PathLike)):
            try:
                import lmdb
            except ImportError as e:  # pragma: no cover - env-dependent
                raise ImportError(
                    "lmdb-mode GDP datasets need the 'lmdb' package "
                    "(not bundled in this image); use the folder layout "
                    "(TripletFolderDataset) or pass a compatible env"
                ) from e
            self.env = lmdb.open(str(root_or_env), readonly=True,
                                 lock=False, readahead=False, meminit=False)
        else:
            self.env = root_or_env
        self.lr_size, self.hr_size = lr_size, hr_size
        self.need_lr = need_lr
        self.hflip = hflip
        with self.env.begin(write=False) as txn:
            self.dataset_len = int(txn.get(b"length"))
        self.data_len = (self.dataset_len if data_len <= 0
                         else min(data_len, self.dataset_len))

    def __len__(self) -> int:
        return self.data_len

    @staticmethod
    def _decode(raw: bytes) -> np.ndarray:
        import io
        img = Image.open(io.BytesIO(raw)).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def load(self, index: int, rng: Optional[np.random.Generator] = None):
        redraw = rng if rng is not None else np.random.default_rng(index)
        with self.env.begin(write=False) as txn:
            def fetch(i):
                tag = str(i).zfill(5)
                hr = txn.get(f"hr_{self.hr_size}_{tag}".encode())
                sr = txn.get(
                    f"sr_{self.lr_size}_{self.hr_size}_{tag}".encode())
                lr = (txn.get(f"lr_{self.lr_size}_{tag}".encode())
                      if self.need_lr else None)
                return hr, sr, lr

            hr, sr, lr = fetch(index)
            while hr is None or sr is None:  # invalid-index skip (ref :78)
                index = int(redraw.integers(0, self.data_len))
                hr, sr, lr = fetch(index)
        out = {"hr": self._decode(hr), "bc": self._decode(sr),
               "path": f"lmdb:{index:05d}"}
        if lr is not None:
            out["lr"] = self._decode(lr)
        else:
            # The reference assumes the lr_{l} key exists
            # (LRHR_dataset.py:74-95); when a writer omitted it, recreate
            # the protocol's LR by PIL-BICUBIC-downsampling the decoded HR
            # (NOT by stride-slicing the bicubic re-up, which would yield a
            # non-protocol nearest-neighbor LR).
            hr_img = Image.fromarray(
                (out["hr"] * 255.0 + 0.5).astype(np.uint8))
            lr_img = hr_img.resize((self.lr_size, self.lr_size),
                                   Image.BICUBIC)
            out["lr"] = np.asarray(lr_img, np.float32) / 255.0
        if self.hflip and rng is not None and rng.integers(0, 2):
            for k in ("lr", "hr", "bc"):
                out[k] = np.ascontiguousarray(out[k][:, ::-1])
        return out


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
