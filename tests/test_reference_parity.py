"""Numerical architecture parity against the reference's own torch model.

Imports the reference EDSR network (from /root/reference, read-only) with
its unavailable dependencies stubbed, transfers the torch weights into our
Flax EDSR by in-order shape matching, and compares forward outputs on the
same input.  EDSR exercises the shared block semantics (SAME-pad convs,
activation placement, global skip, PixelShuffle channel ordering, upsample
scale law) used across the whole zoo.

Skipped automatically when /root/reference is not mounted.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference/SRADSGAN"

torch = pytest.importorskip("torch")
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")


def _stub(name, **attrs):
    mod = sys.modules.get(name) or types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _import_reference_edsr():
    """Import model/edsr.py with its heavy/unavailable deps stubbed."""
    class _Any:
        def __init__(self, *a, **k):
            pass

        def __call__(self, *a, **k):
            return self

        def __getattr__(self, _):
            return _Any()

    # torchvision.transforms (imported * at edsr.py:11)
    tv = _stub("torchvision")
    tvt = _stub("torchvision.transforms", ToPILImage=_Any, ToTensor=_Any,
                Resize=_Any, Compose=_Any, CenterCrop=_Any, Scale=_Any,
                RandomCrop=_Any, Normalize=_Any, functional=_Any())
    tv.transforms = tvt
    _stub("torchvision.models", vgg19=_Any)
    _stub("torchvision.utils", save_image=_Any())
    _stub("torchvision.datasets")
    tv.utils = sys.modules["torchvision.utils"]
    tv.datasets = sys.modules["torchvision.datasets"]
    tv.models = sys.modules["torchvision.models"]
    _stub("skimage", measure=None)
    _stub("skimage.measure", compare_ssim=_Any(), compare_mse=_Any(),
          compare_psnr=_Any(), compare_nrmse=_Any())
    _stub("thop", profile=_Any())

    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def _trunc_normal_(tensor, std=0.02, **k):
        with torch.no_grad():
            tensor.normal_(0, std).clamp_(-2 * std, 2 * std)
        return tensor

    _stub("basicsr")
    _stub("basicsr.archs")
    _stub("basicsr.archs.arch_util", to_2tuple=_to_2tuple,
          trunc_normal_=_trunc_normal_)
    # reference-internal packages the model file imports
    for name in ("data", "data.data", "data.dataset", "utils",
                 "utils.utils", "utils.logger", "utils.PerceptualSimilarity"):
        _stub(name)
    for attr in ("get_RGB_trainDataset", "get_RGB_testDataset",
                 "get_training_datasets", "get_test_datasets"):
        setattr(sys.modules["data"], attr, _Any())
        setattr(sys.modules["data.data"], attr, _Any())
    sys.modules["utils"].utils = sys.modules["utils.utils"]
    sys.modules["utils.utils"].weights_init_normal = lambda *a, **k: None
    sys.modules["utils.logger"].Logger = _Any
    sys.modules["utils.logger"].PrintLogger = _Any
    sys.modules["utils.PerceptualSimilarity"].PerceptualLoss = _Any

    sys.path.insert(0, REF)
    import importlib
    if "model" in sys.modules:
        del sys.modules["model"]
    _stub("model")  # lightweight package shim
    sys.modules["model"].__path__ = [os.path.join(REF, "model")]
    base = importlib.import_module("model.base_networks")
    edsr = importlib.import_module("model.edsr")
    return edsr


def test_edsr_forward_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator

    edsr_mod = _import_reference_edsr()
    tnet = edsr_mod.Net(num_channels=3, base_filter=256, num_residuals=2,
                        upscale_factor=2).eval()

    model = create_generator("edsr", scale=2, base_filters=256,
                             num_residuals=2)
    x = np.random.default_rng(0).random((1, 12, 12, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)

    from sradsgan_tpu.tools.import_reference import import_edsr
    new_params = import_edsr(tnet.state_dict(), variables["params"],
                             num_residuals=2, scale=2)

    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ref = ref.transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_sradsgan_forward_matches_reference_torch():
    """Flagship parity: the reference's torch GeneratorResNet vs our
    SRADSGANGenerator with imported weights."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_sradsgan

    _import_reference_edsr()  # installs the stubs + model package shim
    import importlib
    srad = importlib.import_module("model.sradsgan")

    tnet = srad.GeneratorResNet(srad.ResGroup, n_residual_blocks=2,
                                n_basic_blocks=2,
                                upscale_factor=2).eval()
    model = create_generator("sradsgan", scale=2, n_groups=2, n_blocks=2)
    x = np.random.default_rng(1).random((1, 10, 10, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_params = import_sradsgan(tnet.state_dict(), variables["params"],
                                 n_groups=2, n_blocks=2, scale=2)
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_drcan_forward_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_drcan

    _import_reference_edsr()
    import importlib
    drcan_mod = importlib.import_module("model.drcan")
    tnet = drcan_mod.RCAN(n_resgroups=2, n_resblocks=2, n_feats=16,
                          reduction=4, scale=2).eval()
    model = create_generator("drcan", scale=2, n_feats=16, n_resgroups=2,
                             n_resblocks=2, reduction=4)
    x = np.random.default_rng(2).random((1, 10, 10, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_params = import_drcan(tnet.state_dict(), variables["params"],
                              n_resgroups=2, n_resblocks=2, scale=2)
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-5)


def test_dssr_forward_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_dssr

    _import_reference_edsr()
    import importlib
    dssr_mod = importlib.import_module("model.dssr")
    tnet = dssr_mod.GeneratorResNet(dssr_mod.ResGroup,
                                    n_residual_blocks=2, n_basic_blocks=2,
                                    upscale_factor=2).eval()
    model = create_generator("dssr", scale=2, n_groups=2, n_blocks=2)
    x = np.random.default_rng(3).random((1, 10, 10, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_params = import_dssr(tnet.state_dict(), variables["params"],
                             n_groups=2, n_blocks=2, scale=2)
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=2e-5)


def test_ndsrgan_forward_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_ndsrgan

    _import_reference_edsr()
    import importlib
    mod = importlib.import_module("model.ndsrgan")
    tnet = mod.GeneratorResNet(nf=16, nc=8, upscale_factor=2).eval()
    # trim the torch net to 2 DCRDBs for test size by monkeypatching forward
    model = create_generator("ndsrgan", scale=2, nf=16, nc=8, n_dcrdb=23)
    x = np.random.default_rng(4).random((1, 8, 8, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    from sradsgan_tpu.tools.import_reference import import_ndsrgan
    new_params = import_ndsrgan(tnet.state_dict(), variables["params"],
                                n_dcrdb=23, scale=2)
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_amssrn_forward_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_amssrn

    _import_reference_edsr()
    import importlib
    mod = importlib.import_module("model.amssrn")
    tnet = mod.GeneratorResNet(scale=2).eval()
    model = create_generator("amssrn", scale=2)
    x = np.random.default_rng(5).random((1, 12, 12, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_params = import_amssrn(tnet.state_dict(), variables["params"],
                               scale=2)
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_srgan_forward_matches_reference_torch():
    """SRGAN parity exercises the BatchNorm mapping (eval running stats)."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_srgan

    _import_reference_edsr()
    import importlib
    mod = importlib.import_module("model.srgan")
    tnet = mod.GeneratorResNet(n_residual_blocks=3, upscale_factor=2).eval()
    # randomize running stats so the test is sensitive to the BN mapping
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    model = create_generator("srgan", scale=2, num_residuals=3)
    x = np.random.default_rng(6).random((1, 12, 12, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_vars = import_srgan(tnet.state_dict(), variables, num_residuals=3,
                            scale=2)
    ours = np.asarray(model.apply(new_vars, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_sragan_forward_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_sragan

    _import_reference_edsr()
    import importlib
    base = importlib.import_module("model.base_networks")
    mod = importlib.import_module("model.sragan")
    tnet = mod.GeneratorResNet(base.ResidualBlock_Block_WithAttention,
                               n_residual_blocks=2, n_basic_blocks=2,
                               upscale_factor=2).eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    model = create_generator("sragan", scale=2, n_groups=2, n_blocks=2)
    x = np.random.default_rng(8).random((1, 10, 10, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_vars = import_sragan(tnet.state_dict(), variables, n_groups=2,
                             n_blocks=2, scale=2)
    ours = np.asarray(model.apply(new_vars, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_hat_forward_matches_reference_torch():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_hat

    _import_reference_edsr()
    # HAT imports einops.rearrange and timm-style helpers internally? it
    # uses to_2tuple from its own file; einops is available.
    import importlib
    mod = importlib.import_module("model.hat")
    tnet = mod.GeneratorResNet(img_size=8, embed_dim=12, depths=(2,),
                               num_heads=(2,), window_size=4,
                               compress_ratio=3, squeeze_factor=4,
                               mlp_ratio=2.0, upscale=2,
                               upsampler="pixelshuffle").eval()
    model = create_generator("hat", scale=2, embed_dim=12, depths=(2,),
                             num_heads=(2,), window_size=4, mlp_ratio=2.0,
                             compress_ratio=3, squeeze_factor=4)
    x = np.random.default_rng(9).random((1, 8, 8, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_params = import_hat(tnet.state_dict(), variables["params"],
                            depths=(2,), scale=2)
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=5e-5)


def test_sradsgan_x4_shared_upsample_parity():
    """x4 = two PixelShuffle stages sharing ONE conv (the reference's
    `upsampling += upsampling_two` quirk) — verify multi-stage parity."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.tools.import_reference import import_sradsgan

    _import_reference_edsr()
    import importlib
    srad = importlib.import_module("model.sradsgan")
    tnet = srad.GeneratorResNet(srad.ResGroup, n_residual_blocks=1,
                                n_basic_blocks=1, upscale_factor=4).eval()
    model = create_generator("sradsgan", scale=4, n_groups=1, n_blocks=1)
    x = np.random.default_rng(10).random((1, 6, 6, 3)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           train=False)
    new_params = import_sradsgan(tnet.state_dict(), variables["params"],
                                 n_groups=1, n_blocks=1, scale=4)
    ours = np.asarray(model.apply({"params": new_params}, jnp.asarray(x),
                                  train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == (1, 24, 24, 3)
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)


def test_discriminator_matches_reference_torch():
    """Flagship patch D (8 conv blocks + CBAM gates + BN) parity."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models import create_discriminator
    from sradsgan_tpu.tools.import_reference import import_patch_discriminator

    _import_reference_edsr()
    import importlib
    srad = importlib.import_module("model.sradsgan")
    tnet = srad.Discriminator(attention=True).eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 1.5)
    d = create_discriminator("sradsgan")
    x = np.random.default_rng(11).random((1, 48, 48, 3)).astype(np.float32)
    variables = d.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_vars = import_patch_discriminator(tnet.state_dict(), variables)
    ours = np.asarray(d.apply(new_vars, jnp.asarray(x), train=False))
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 3, 1), atol=3e-5)
