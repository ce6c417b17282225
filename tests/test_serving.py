"""Serving/export tests."""

import numpy as np

import jax
import jax.numpy as jnp

from sradsgan_tpu.models import create_generator
from sradsgan_tpu.serving import Predictor, export_model, load_exported


def _model():
    m = create_generator("edsr", scale=2, base_filters=8, num_residuals=1)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)),
               train=False)
    return m, v


def test_predictor_buckets_and_crop():
    m, v = _model()
    pred = Predictor(m, v, scale=2, buckets=(16, 32))
    out = pred(np.random.default_rng(0).random((1, 12, 14, 3)).astype(
        np.float32))
    assert out.shape == (1, 24, 28, 3)
    # exact-match bucket
    out = pred(np.random.default_rng(0).random((2, 32, 32, 3)).astype(
        np.float32))
    assert out.shape == (2, 64, 64, 3)


def test_predictor_tiled_fallback():
    m, v = _model()
    pred = Predictor(m, v, scale=2, buckets=(16,), tile=16, halo=4)
    out = pred(np.random.default_rng(0).random((40, 40, 3)).astype(
        np.float32))
    assert out.shape == (80, 80, 3)


def test_export_roundtrip(tmp_path):
    m, v = _model()
    path = export_model(m, v, lr_size=16, out_path=str(tmp_path / "m.bin"))
    fn = load_exported(path)
    x = np.random.default_rng(0).random((1, 16, 16, 3)).astype(np.float32)
    got = np.asarray(fn(x))
    want = np.asarray(m.apply(v, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, atol=1e-5)
