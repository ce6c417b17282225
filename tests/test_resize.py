"""PIL-parity tests for the device-side bicubic resize."""

import numpy as np
import pytest
from PIL import Image

from sradsgan_tpu.ops import bicubic_resize, degrade_pair, resize_matrix


rng = np.random.default_rng(1)


def _pil_resize(img01: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Resize a float [0,1] HWC image through PIL 'F' mode per channel."""
    chans = []
    for c in range(img01.shape[-1]):
        im = Image.fromarray(img01[..., c].astype(np.float32), mode="F")
        chans.append(np.asarray(im.resize((out_w, out_h), Image.BICUBIC)))
    return np.stack(chans, axis=-1)


@pytest.mark.parametrize("in_size,out_size", [(216, 54), (216, 108),
                                              (216, 27), (216, 24),
                                              (54, 216), (72, 216)])
def test_matches_pil_float_path(in_size, out_size):
    img = rng.random((in_size, in_size, 3)).astype(np.float32)
    ours = np.asarray(bicubic_resize(img, out_size, out_size))
    ref = _pil_resize(img, out_size, out_size)
    assert np.max(np.abs(ours - ref)) < 2e-5


def test_matches_pil_uint8_path_within_half_lsb():
    """Against PIL's fixed-point uint8 path: within ~1/255 everywhere."""
    arr = rng.integers(0, 256, (216, 216, 3), dtype=np.uint8)
    ref = np.asarray(
        Image.fromarray(arr).resize((54, 54), Image.BICUBIC)).astype(
            np.float32) / 255.0
    ours = np.asarray(bicubic_resize(arr.astype(np.float32) / 255.0, 54, 54))
    assert np.mean(np.abs(np.clip(ours, 0, 1) - ref)) < 1.5e-3
    assert np.max(np.abs(np.clip(ours, 0, 1) - ref)) < 4.0 / 255.0


def test_resize_matrix_rows_sum_to_one():
    w = resize_matrix(216, 54)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-6)


def test_degrade_pair_shapes():
    hr = rng.random((2, 216, 216, 3)).astype(np.float32)
    lr, bc = degrade_pair(hr, 4)
    assert lr.shape == (2, 54, 54, 3)
    assert bc.shape == (2, 216, 216, 3)


def test_upsample_preserves_constant():
    img = np.full((27, 27, 3), 0.5, dtype=np.float32)
    up = np.asarray(bicubic_resize(img, 216, 216))
    np.testing.assert_allclose(up, 0.5, atol=1e-6)
