"""Data pipeline tests: grayscale, grain loader, loader mechanics."""

import numpy as np

from sradsgan_tpu.data.datasets import FolderDataset, SyntheticDataset
from sradsgan_tpu.data.loader import DataLoader


def test_grayscale_triplets(tmp_path):
    from PIL import Image
    p = str(tmp_path / "x.png")
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (32, 32, 3), dtype=np.uint8)).save(p)
    ds = FolderDataset([p], scale=2, crop_size=32, gray=True)
    out = ds.load(0)
    assert out["hr"].shape == (32, 32, 1)
    assert out["lr"].shape == (16, 16, 1)


def test_grain_loader_batches():
    from sradsgan_tpu.data.grain_pipeline import make_grain_loader
    ds = SyntheticDataset(12, scale=2, crop_size=16)
    loader = make_grain_loader(ds, batch_size=4, num_workers=0)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["lr"].shape == (4, 8, 8, 3)
    assert batches[0]["hr"].shape == (4, 16, 16, 3)


def test_loader_epoch_reshuffles():
    ds = SyntheticDataset(16, scale=2, crop_size=16)
    loader = DataLoader(ds, batch_size=4, shuffle=True, num_workers=2,
                        seed=1)
    first = [b["path"] for b in loader]
    second = [b["path"] for b in loader]
    assert first != second  # epoch counter advances the shuffle seed
