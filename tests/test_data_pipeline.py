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


class _FakeTxn:
    def __init__(self, store):
        self._store = store

    def get(self, key):
        return self._store.get(key)

    def put(self, key, value):
        self._store[key] = value


class _FakeLMDBEnv:
    """Duck-typed lmdb environment over a dict (the real lib is optional)."""

    def __init__(self, store=None):
        self.store = store if store is not None else {}

    def begin(self, write=False):
        import contextlib

        @contextlib.contextmanager
        def txn():
            yield _FakeTxn(self.store)
        return txn()


def test_gdp_lmdb_schema_roundtrip(tmp_path):
    """prepare_data's lmdb record schema round-trips through the lmdb-mode
    dataset (reference GDP_x0/data/LRHR_dataset.py:62-76 keys), without
    requiring the optional lmdb package."""
    from PIL import Image

    from sradsgan_tpu.data.datasets import LMDBTripletDataset
    from sradsgan_tpu.tools.prepare_data import iter_triplet_records

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (24, 24, 3), dtype=np.uint8),
                        "RGB").save(src / f"im{i}.png")

    env = _FakeLMDBEnv()
    for key, value in iter_triplet_records(str(src), hr_size=16, lr_size=8):
        env.store[key] = value

    ds = LMDBTripletDataset(env, lr_size=8, hr_size=16)
    assert len(ds) == 3
    rec = ds.load(1)
    assert rec["hr"].shape == (16, 16, 3)
    assert rec["bc"].shape == (16, 16, 3)
    assert rec["lr"].shape == (8, 8, 3)
    assert rec["hr"].dtype == np.float32 and rec["hr"].max() <= 1.0


def test_gdp_lmdb_invalid_index_redraw():
    """Missing keys redraw a random valid index (reference :78-95)."""
    from PIL import Image
    import io

    from sradsgan_tpu.data.datasets import LMDBTripletDataset

    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8), "RGB").save(
        buf, format="PNG")
    png = buf.getvalue()
    lr_buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8), "RGB").save(
        lr_buf, format="PNG")
    store = {b"length": b"2",
             b"hr_16_00000": png, b"sr_8_16_00000": png,
             b"lr_8_00000": lr_buf.getvalue()}
    # index 1 is missing entirely -> must fall back to index 0
    ds = LMDBTripletDataset(_FakeLMDBEnv(store), lr_size=8, hr_size=16)
    rec = ds.load(1, rng=np.random.default_rng(0))
    assert rec["path"] == "lmdb:00000"
