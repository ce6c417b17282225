"""Tests for degradation ops, reporting, prep tools, scene classification."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp


def test_gaussian_kernels_normalized():
    from sradsgan_tpu.ops.degrade import gaussian_kernels
    k = gaussian_kernels(jax.random.PRNGKey(0), 4, size=11, isotropic=False)
    assert k.shape == (4, 11, 11)
    np.testing.assert_allclose(np.asarray(k).sum(axis=(1, 2)), 1.0,
                               atol=1e-5)


def test_batch_blur_preserves_constant():
    from sradsgan_tpu.ops.degrade import batch_blur, gaussian_kernels
    x = jnp.full((2, 16, 16, 3), 0.5)
    k = gaussian_kernels(jax.random.PRNGKey(1), 2)
    out = batch_blur(x, k)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_srmd_preprocess_shapes():
    from sradsgan_tpu.ops.degrade import srmd_preprocess
    hr = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 3))
    lr, kernels = srmd_preprocess(jax.random.PRNGKey(3), hr, 4,
                                  noise_sigma=0.01)
    assert lr.shape == (2, 8, 8, 3)
    assert kernels.shape[0] == 2


def test_report_params_and_flops(tmp_path):
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.utils.report import print_network_to_file
    model = create_generator("edsr", scale=2, base_filters=8,
                             num_residuals=1)
    x = jnp.zeros((1, 8, 8, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    path = print_network_to_file(model, variables, x, str(tmp_path), "EDSR")
    text = open(path).read()
    assert "params:" in text and "EDSR" in text


def _make_class_tree(root, n_classes=3, n_imgs=6, size=32):
    rng = np.random.default_rng(0)
    for c in range(n_classes):
        d = os.path.join(root, f"class{c}")
        os.makedirs(d, exist_ok=True)
        for i in range(n_imgs):
            arr = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            arr[:, :, c % 3] = 255  # class-colored so features separate
            Image.fromarray(arr).save(os.path.join(d, f"img{i}.png"))


def test_prepare_data_tools(tmp_path):
    from sradsgan_tpu.tools.prepare_data import (prepare_classdirs,
                                                 prepare_triplets)
    src = str(tmp_path / "src")
    _make_class_tree(src)
    n = prepare_triplets(src, str(tmp_path / "trip"), hr_size=32, lr_size=8)
    assert n == 18
    assert len(os.listdir(tmp_path / "trip" / "lr_8")) == 18
    n = prepare_classdirs(src, str(tmp_path / "cls"), size=32, scale=4)
    assert n == 18


def test_scene_classifier_end_to_end(tmp_path):
    from sradsgan_tpu.tools.scene_classification import SceneClassifier
    root = str(tmp_path / "uc")
    _make_class_tree(root, n_classes=3, n_imgs=8)
    clf = SceneClassifier(image_size=32, feature_batch=8)
    head = clf.train_head(root, epochs=200)
    assert np.isfinite(head["train_loss"])
    # evaluating on the same (HR) tree should beat chance with the
    # class-colored images even with a random trunk
    result = clf.evaluate_folder(root)
    assert result["accuracy"] > 0.5
