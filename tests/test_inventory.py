"""Tests for the long-tail component inventory (SURVEY.md §2.2-2.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_esrgan_blocks_and_nets():
    from sradsgan_tpu.nn.esrgan import RRDB, RRDBNet, SRResNet
    x = jnp.zeros((1, 12, 12, 3))
    for cls in (RRDBNet, SRResNet):
        m = cls(scale=2, nf=16, nb=2)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        y = m.apply(v, x, train=False)
        assert y.shape == (1, 24, 24, 3)


def test_deconv_and_upsample2x_blocks():
    from sradsgan_tpu.nn.blocks import DeconvBlock, Upsample2xBlock
    x = jnp.zeros((1, 8, 8, 16))
    for mode in ("deconv", "ps", "rnc"):
        m = Upsample2xBlock(16, upsample=mode, norm=None)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        assert m.apply(v, x, train=False).shape == (1, 16, 16, 16)


def test_vgg_style_and_sn_discriminators():
    from sradsgan_tpu.models.discriminators import (SNPatchDiscriminator,
                                                    VGGStyleDiscriminator)
    x = jnp.zeros((2, 64, 64, 3))
    d = VGGStyleDiscriminator(input_size=64)
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    assert d.apply(v, x, train=False).shape == (2, 1)

    d = SNPatchDiscriminator()
    v = d.init(jax.random.PRNGKey(0), x, train=False)
    out, _ = d.apply(v, x, train=True, mutable=["spectral"])
    assert out.shape[0] == 2 and out.shape[-1] == 1


def test_extra_losses():
    from sradsgan_tpu.losses.extra import (boundaries_loss, centralized_loss,
                                           contrastive_loss, downscale_loss,
                                           sparsity_loss, sum_to_one_loss)
    rng = jax.random.PRNGKey(0)
    sr = jax.random.uniform(rng, (1, 16, 16, 3))
    lr = jax.random.uniform(rng, (1, 8, 8, 3))
    assert np.isfinite(float(downscale_loss(sr, lr, 2)))

    # a centered delta kernel minimizes the kernel regularizers
    k = np.zeros((1, 11, 11), np.float32)
    k[0, 5, 5] = 1.0
    k = jnp.asarray(k)
    assert float(centralized_loss(k)) == pytest.approx(0.0, abs=1e-6)
    assert float(boundaries_loss(k)) == pytest.approx(0.0, abs=1e-6)
    assert float(sum_to_one_loss(k)) == pytest.approx(0.0, abs=1e-6)
    assert float(sparsity_loss(k)) > 0
    a, p, n = (jax.random.uniform(jax.random.PRNGKey(i), (2, 4, 4, 8))
               for i in range(3))
    assert float(contrastive_loss(a, a, n)) == pytest.approx(0.0, abs=1e-6)


def test_kernel_post_processing():
    from sradsgan_tpu.ops.kernel_ops import post_process_kernel
    rng = np.random.default_rng(0)
    k = rng.random((13, 13))
    out = post_process_kernel(k, n_keep=20, target_size=11)
    assert out.shape == (11, 11)
    assert out.sum() == pytest.approx(1.0, abs=1e-6)


def test_dataset_variants(tmp_path):
    from PIL import Image
    from sradsgan_tpu.data.datasets import (AugmentedCropDataset,
                                            BlurDegradedDataset,
                                            NoisyDataset)
    rng = np.random.default_rng(0)
    files = []
    for i in range(2):
        p = str(tmp_path / f"img{i}.png")
        Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                     dtype=np.uint8)).save(p)
        files.append(p)
    for cls in (AugmentedCropDataset, NoisyDataset, BlurDegradedDataset):
        ds = cls(files, scale=2, crop_size=32)
        out = ds.load(0, np.random.default_rng(1))
        assert out["lr"].shape == (16, 16, 3)
        assert out["hr"].shape == (32, 32, 3)


def test_triplet_folder_dataset(tmp_path):
    from sradsgan_tpu.tools.prepare_data import prepare_triplets
    from sradsgan_tpu.data.datasets import TripletFolderDataset
    from PIL import Image
    src = str(tmp_path / "src")
    import os
    os.makedirs(src)
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(
            os.path.join(src, f"{i}.png"))
    prepare_triplets(src, str(tmp_path / "out"), hr_size=32, lr_size=8)
    ds = TripletFolderDataset(str(tmp_path / "out"), lr_size=8, hr_size=32,
                              hflip=True)
    assert len(ds) == 3
    out = ds.load(0, np.random.default_rng(0))
    assert out["hr"].shape == (32, 32, 3) and out["lr"].shape == (8, 8, 3)


def test_tiled_inference_matches_whole_image():
    """Tiled SR of a small image must equal whole-image SR away from
    boundaries (halo absorbs the receptive field)."""
    from sradsgan_tpu.evaluation.tiled import tiled_super_resolve
    from sradsgan_tpu.models import create_generator
    model = create_generator("edsr", scale=2, base_filters=8,
                             num_residuals=1)
    img = np.random.default_rng(0).random((48, 48, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(img)[None],
                           train=False)
    whole = np.asarray(model.apply(variables, jnp.asarray(img)[None],
                                   train=False))[0]
    tiled = tiled_super_resolve(model, variables, img, scale=2, tile=24,
                                halo=6)
    assert tiled.shape == whole.shape
    # Interior must match exactly (tile seams invisible); the outer border
    # legitimately differs: tiled inference reflect-pads the scene edge
    # while whole-image SAME convs zero-pad it.
    b = 12  # halo * scale
    np.testing.assert_allclose(tiled[b:-b, b:-b], whole[b:-b, b:-b],
                               atol=2e-4)
    np.testing.assert_allclose(tiled, whole, atol=5e-2)


def test_augmented_conv_shapes_and_relative():
    from sradsgan_tpu.nn.augmented_conv import AugmentedConv
    x = jnp.zeros((2, 8, 8, 3))
    for relative in (False, True):
        m = AugmentedConv(out_channels=20, dk=8, dv=4, num_heads=4,
                          relative=relative)
        v = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(v, x)
        assert y.shape == (2, 8, 8, 20)
    # stride 2
    m = AugmentedConv(out_channels=20, dk=8, dv=4, num_heads=4, stride=2)
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (2, 4, 4, 20)


def test_feature_extractors():
    from sradsgan_tpu.nn.extractors import (MINCNet, ResNet101FeatureExtractor,
                                            VGGFeatureExtractor)
    x = jnp.zeros((1, 64, 64, 3))
    m = VGGFeatureExtractor(feature_layer=34)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape == (1, 4, 4, 512)  # conv5_4 at /16

    m = VGGFeatureExtractor(feature_layer=11)  # relu3_1 (the content tap)
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 16, 16, 256)

    m = ResNet101FeatureExtractor(stage_blocks=(1, 1, 1))  # small smoke
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    y = m.apply(v, x, train=False)
    assert y.shape[-1] == 1024

    m = MINCNet()
    v = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(v, x).shape == (1, 4, 4, 512)


def test_poisson_noise_both_tiers(tmp_path):
    """Poisson shot noise (reference utils/utils.py:897-905): host dataset
    mode + device op agree on semantics (non-negative, clipped, mean close
    to the clean signal)."""
    from PIL import Image
    from sradsgan_tpu.data.datasets import NoisyDataset
    from sradsgan_tpu.ops.degrade import add_poisson_noise

    rng = np.random.default_rng(0)
    p = str(tmp_path / "img.png")
    Image.fromarray(rng.integers(0, 255, (64, 64, 3),
                                 dtype=np.uint8)).save(p)
    ds = NoisyDataset([p], scale=2, crop_size=32, noise="poisson")
    out = ds.load(0, np.random.default_rng(1))
    lr = out["lr"]
    assert lr.min() >= 0.0 and lr.max() <= 1.0
    clean = NoisyDataset([p], scale=2, crop_size=32,
                         noise="gaussian", noise_level=0.0).load(0)["lr"]
    assert abs(float(lr.mean()) - float(clean.mean())) < 0.05
    assert float(np.abs(lr - clean).mean()) > 1e-4  # noise actually applied

    x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    y = add_poisson_noise(jax.random.PRNGKey(0), x)
    assert y.shape == x.shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    assert abs(float(y.mean()) - float(x.mean())) < 0.05


def test_triplet_folder_hr_mask_mode(tmp_path):
    """GDP masked-HR triplets (LRHR_dataset.py:33-40, 99-104): the
    hr_mask_{r} folder is read and flipped jointly with HR."""
    import os
    from PIL import Image
    from sradsgan_tpu.tools.prepare_data import prepare_triplets
    from sradsgan_tpu.data.datasets import TripletFolderDataset

    src = str(tmp_path / "src")
    os.makedirs(src)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (32, 32, 3),
                                     dtype=np.uint8)).save(
            os.path.join(src, f"{i}.png"))
    prepare_triplets(src, str(tmp_path / "out"), hr_size=32, lr_size=8)
    mask_dir = os.path.join(str(tmp_path / "out"), "hr_mask_32")
    os.makedirs(mask_dir)
    hr_dir = os.path.join(str(tmp_path / "out"), "hr_32")
    for name in sorted(os.listdir(hr_dir)):
        m = rng.integers(0, 2, (32, 32), dtype=np.uint8) * 255
        Image.fromarray(np.stack([m] * 3, -1)).save(
            os.path.join(mask_dir, name))

    ds = TripletFolderDataset(str(tmp_path / "out"), lr_size=8, hr_size=32,
                              hr_mask=True)
    out = ds.load(0)
    assert out["hr_mask"].shape == (32, 32, 3)
    assert set(np.unique(out["hr_mask"])) <= {0.0, 1.0}

    # joint flip: load with an rng that flips, mask must flip with hr
    ds_flip = TripletFolderDataset(str(tmp_path / "out"), lr_size=8,
                                   hr_size=32, hflip=True, hr_mask=True)
    for seed in range(8):
        r = np.random.default_rng(seed)
        o = ds_flip.load(0, r)
        flipped = not np.array_equal(o["hr"], out["hr"])
        assert np.array_equal(
            o["hr_mask"], out["hr_mask"][:, ::-1] if flipped
            else out["hr_mask"])


def test_attention_overlay_and_gif(tmp_path):
    """show_attention_on_image (utils/utils.py:156-167) + make_gif
    (:87-95)."""
    from PIL import Image
    from sradsgan_tpu.utils.plotting import (make_gif,
                                             show_attention_on_image)

    rng = np.random.default_rng(0)
    img = rng.random((24, 24, 3)).astype(np.float32)
    mask = rng.random((24, 24)).astype(np.float32)
    out = str(tmp_path / "attn.png")
    show_attention_on_image(img, mask, out)
    arr = np.asarray(Image.open(out))
    assert arr.shape == (24, 24, 3)

    frames = []
    for i in range(3):
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(rng.integers(0, 255, (16, 16, 3),
                                     dtype=np.uint8)).save(p)
        frames.append(p)
    gif = str(tmp_path / "anim.gif")
    make_gif(frames, gif, fps=5)
    g = Image.open(gif)
    assert g.format == "GIF" and getattr(g, "n_frames", 1) == 3
