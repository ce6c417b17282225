"""LPIPS metric tests (architecture-level; backbone uncalibrated here)."""

import numpy as np
import pytest

from sradsgan_tpu.losses.lpips import batched_lpips, lpips_fn


rng = np.random.default_rng(3)


def test_identical_images_zero():
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    d = np.asarray(batched_lpips(x, x))
    assert np.allclose(d, 0.0, atol=1e-6)


def test_symmetric_and_positive():
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    y = rng.random((1, 32, 32, 3)).astype(np.float32)
    dxy = float(batched_lpips(x, y)[0])
    dyx = float(batched_lpips(y, x)[0])
    assert dxy > 0
    assert dxy == pytest.approx(dyx, rel=1e-5)


def test_monotone_in_noise():
    fn = lpips_fn()
    x = rng.random((40, 40, 3)).astype(np.float32)
    d_small = fn(x, np.clip(x + rng.normal(0, 0.02, x.shape), 0, 1).astype(np.float32))
    d_big = fn(x, np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1).astype(np.float32))
    assert d_big > d_small >= 0
