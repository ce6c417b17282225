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
    # reference-internal packages the model file imports
    for name in ("data", "data.data", "data.dataset", "utils",
                 "utils.utils", "utils.logger", "utils.PerceptualSimilarity"):
        _stub(name)
    sys.modules["data"].get_RGB_trainDataset = _Any()
    sys.modules["data"].get_RGB_testDataset = _Any()
    sys.modules["data.data"].get_RGB_trainDataset = _Any()
    sys.modules["data.data"].get_RGB_testDataset = _Any()
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
