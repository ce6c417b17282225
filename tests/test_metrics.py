"""Metric-protocol parity tests.

skimage is unavailable in this image, so the oracle for SSIM is an
independent naive sliding-window implementation of the same published
formula (different code path: explicit window extraction vs uniform_filter),
plus identities and hand-computable cases for PSNR/MSE/ERGAS.
"""

import numpy as np
import pytest

from sradsgan_tpu.metrics import (
    batched_psnr,
    batched_ssim,
    compare_ergas,
    compare_mse,
    compare_psnr,
    compare_ssim,
    tensor_to_uint8,
)

rng = np.random.default_rng(0)


def _naive_ssim_channel(x, y, data_range=255.0, win=7):
    """Direct sliding-window SSIM — independent oracle."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    h, w = x.shape
    npix = win * win
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    vals = []
    for i in range(h - win + 1):
        for j in range(w - win + 1):
            px = x[i:i + win, j:j + win].ravel()
            py = y[i:i + win, j:j + win].ravel()
            ux, uy = px.mean(), py.mean()
            vx = px.var(ddof=1)
            vy = py.var(ddof=1)
            vxy = np.cov(px, py, ddof=1)[0, 1]
            vals.append(((2 * ux * uy + c1) * (2 * vxy + c2))
                        / ((ux ** 2 + uy ** 2 + c1) * (vx + vy + c2)))
    return float(np.mean(vals))


def test_mse_psnr_hand_values():
    a = np.zeros((8, 8, 3), dtype=np.uint8)
    b = np.full((8, 8, 3), 10, dtype=np.uint8)
    assert compare_mse(a, b) == 100.0
    assert compare_psnr(a, b) == pytest.approx(10 * np.log10(255 ** 2 / 100.0))


def test_psnr_identical_is_inf():
    a = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    assert compare_psnr(a, a) == float("inf")


def test_ssim_identity():
    a = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert compare_ssim(a, a) == pytest.approx(1.0)


def test_ssim_matches_naive_oracle():
    x = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    y = np.clip(x.astype(np.int32) + rng.integers(-20, 20, x.shape), 0,
                255).astype(np.uint8)
    ours = compare_ssim(x, y, multichannel=False)
    oracle = _naive_ssim_channel(x, y)
    assert ours == pytest.approx(oracle, abs=1e-10)


def test_ssim_multichannel_is_channel_mean():
    x = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    y = rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)
    per_c = [compare_ssim(x[..., c], y[..., c], data_range=255.0,
                          multichannel=False) for c in range(3)]
    assert compare_ssim(x, y) == pytest.approx(np.mean(per_c))


def test_ergas_formula():
    """ergas2 = 100*sqrt(mse/mean^2/C)/scale (reference utils/utils.py:954)."""
    gt = rng.integers(1, 256, (16, 16, 3)).astype(np.float64)
    pred = gt + 5.0
    expected = 100.0 * np.sqrt(25.0 / np.mean(gt) ** 2 / 3) / 4
    assert compare_ergas(gt, pred, scale=4) == pytest.approx(expected)


def test_uint8_roundtrip_lossless():
    """k/255 float -> uint8 must return k for every k (ToTensor/ToPILImage)."""
    k = np.arange(256, dtype=np.float32)
    img = np.tile((k / 255.0)[:, None, None], (1, 4, 3))
    out = tensor_to_uint8(img)
    assert np.array_equal(out[:, 0, 0], np.arange(256, dtype=np.uint8))


def test_batched_psnr_matches_numpy():
    pred = rng.random((2, 24, 24, 3)).astype(np.float32)
    target = rng.random((2, 24, 24, 3)).astype(np.float32)
    dev = np.asarray(batched_psnr(pred, target))
    for i in range(2):
        ref = compare_psnr(tensor_to_uint8(target[i]),
                           tensor_to_uint8(pred[i]))
        assert dev[i] == pytest.approx(ref, abs=1e-3)


def test_batched_ssim_matches_numpy():
    pred = rng.random((2, 24, 24, 3)).astype(np.float32)
    target = np.clip(pred + rng.normal(0, 0.05, pred.shape), 0,
                     1).astype(np.float32)
    dev = np.asarray(batched_ssim(pred, target))
    for i in range(2):
        ref = compare_ssim(tensor_to_uint8(pred[i]),
                           tensor_to_uint8(target[i]))
        assert dev[i] == pytest.approx(ref, abs=2e-4)
