"""Shape/dtype tests for the generator zoo and discriminators."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sradsgan_tpu.models import (available_models, create_discriminator,
                                 create_generator, get_spec)

CNN_MODELS = ["edsr", "srgan", "drcan", "dssr", "sragan", "ndsrgan",
              "amssrn", "sradsgan"]


def _init_and_apply(model, x, train=False):
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    kwargs = {}
    if "batch_stats" in variables:
        out = model.apply(variables, x, train=train,
                          mutable=["batch_stats"] if train else False)
        return out[0] if train else out
    return model.apply(variables, x, train=train)


@pytest.mark.parametrize("name", CNN_MODELS)
def test_generator_x2_shapes(name):
    model = create_generator(name, scale=2)
    x = jnp.zeros((1, 24, 24, 3), jnp.float32)
    y = _init_and_apply(model, x)
    assert y.shape == (1, 48, 48, 3)
    assert y.dtype == jnp.float32


@pytest.mark.parametrize("scale", [2, 3, 4, 8, 9])
def test_sradsgan_all_scales(scale):
    model = create_generator("sradsgan", scale=scale)
    x = jnp.zeros((1, 12, 12, 3), jnp.float32)
    y = _init_and_apply(model, x)
    assert y.shape == (1, 12 * scale, 12 * scale, 3)


@pytest.mark.parametrize("name", ["sradsgan", "srgan", "ndsrgan"])
def test_discriminator_output_patch_map(name):
    d = create_discriminator(name)
    x = jnp.zeros((2, 48, 48, 3), jnp.float32)
    variables = d.init(jax.random.PRNGKey(0), x, train=False)
    y = d.apply(variables, x, train=False)
    assert y.shape[0] == 2 and y.shape[-1] == 1
    assert y.ndim == 4  # patch logit map


def test_generator_not_trivially_zero():
    model = create_generator("edsr", scale=2, num_residuals=2,
                             base_filters=16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    y = _init_and_apply(model, x)
    assert float(jnp.abs(y).max()) > 0


def test_registry_complete():
    missing = set(CNN_MODELS) - set(available_models())
    assert not missing
    spec = get_spec("sradsgan")
    assert spec.adversarial and spec.gan_type == "wgan-gp"


def test_hat_shapes_and_padding():
    """HAT pads non-window-multiple inputs and crops the output back."""
    model = create_generator("hat", scale=2, embed_dim=12,
                             depths=(2,), num_heads=(2,), window_size=4)
    x = jnp.zeros((1, 10, 10, 3), jnp.float32)  # 10 % 4 != 0
    y = _init_and_apply(model, x)
    assert y.shape == (1, 20, 20, 3)


def test_hat_default_window_rule():
    from sradsgan_tpu.models.hat import HAT
    assert HAT(scale=4)._window() == 9
    assert HAT(scale=3)._window() == 8
    assert HAT(scale=9)._window() == 8


def test_hat_nt_attention_matches_ref(monkeypatch):
    """SRADSGAN_TPU_HAT_ATTN=nt (round-5 default, docs/PERF.md HAT
    campaign): the transpose-free attention layout computes the identical
    function on the SAME param tree — shifted windows, masks, OCAB
    included; `=ref` restores the transposed formulation."""
    from sradsgan_tpu.models.hat import HAT

    # window auto-rule gives 9; 18x18 input -> 4 windows, depth 2
    # exercises the shift=4 masked path; one OCAB per group.
    model = HAT(scale=4, embed_dim=12, depths=(2,), num_heads=(2,))
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (2, 18, 18, 3)).astype(np.float32))

    monkeypatch.setenv("SRADSGAN_TPU_HAT_ATTN", "ref")
    params = model.init(jax.random.PRNGKey(0), x)
    y_ref = model.apply(params, x)

    monkeypatch.setenv("SRADSGAN_TPU_HAT_ATTN", "nt")
    y_nt = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_nt), np.asarray(y_ref),
                               atol=2e-5)

    # bf16-softmax flag: runs and stays close to the f32-softmax output
    monkeypatch.setenv("SRADSGAN_TPU_HAT_SOFTMAX", "bf16")
    y_bf = model.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_bf), np.asarray(y_ref),
                               atol=5e-2)


def test_hat_attention_defaults(monkeypatch):
    """Pin the round-5 HAT defaults: nt layout (exact math, −19.6%
    measured) is ON; bf16 softmax is OFF — it FAILED its two-seed twin
    bless (systematic −0.22 dB endpoint gap, docs/VALIDATION.md round 5)
    and must stay opt-in."""
    from sradsgan_tpu.models.hat import _attn_impl, _softmax_dtype

    monkeypatch.delenv("SRADSGAN_TPU_HAT_ATTN", raising=False)
    monkeypatch.delenv("SRADSGAN_TPU_HAT_SOFTMAX", raising=False)
    assert _attn_impl() == "nt"
    assert _softmax_dtype(jnp.bfloat16) == jnp.float32
    assert _softmax_dtype(jnp.float32) == jnp.float32
    monkeypatch.setenv("SRADSGAN_TPU_HAT_SOFTMAX", "bf16")
    assert _softmax_dtype(jnp.bfloat16) == jnp.bfloat16


def test_make_act_prelu_is_learned():
    """make_act('prelu') must create a real PReLU param, not silently
    return ReLU (torch nn.PReLU: one learned slope, init 0.25)."""
    import jax
    import numpy as np
    from flax import linen as nn

    from sradsgan_tpu.nn.blocks import ConvBlock, make_act

    blk = ConvBlock(4, activation="prelu")
    x = jnp.ones((1, 4, 4, 3))
    variables = blk.init(jax.random.PRNGKey(0), x)
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(variables)[0]]
    assert any("alpha" in p for p in paths), paths

    # standalone: negative inputs scaled by 0.25 at init
    class Wrap(nn.Module):
        @nn.compact
        def __call__(self, x):
            return make_act("prelu")(x)

    w = Wrap()
    v = w.init(jax.random.PRNGKey(0), x)
    y = w.apply(v, jnp.array([[-2.0, 3.0]]))
    np.testing.assert_allclose(np.asarray(y), [[-0.5, 3.0]])


def test_chunked_sgam_matches_dense_path(monkeypatch):
    """SRADSGAN_TPU_SGAM_IMPL=chunked: the flash-style query-chunked SGAM
    equals the dense bf16-energy formulation to bf16 rounding, and its
    rematerialized backward is finite."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.nn.attention import _chunked_attention

    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.random((2, 48, 2)), jnp.bfloat16)
    k = jnp.asarray(rng.random((2, 48, 2)), jnp.bfloat16)
    v = jnp.asarray(rng.random((2, 48, 16)), jnp.bfloat16)
    out = _chunked_attention(q, k, v, target_chunk=16)
    e = jnp.einsum("bqd,bkd->bqk", q, k,
                   preferred_element_type=jnp.bfloat16)
    m = jnp.max(e, -1, keepdims=True).astype(jnp.float32)
    p = jnp.exp(e.astype(jnp.float32) - m)
    ref = jnp.einsum("bqk,bkc->bqc",
                     (p / jnp.sum(p, -1, keepdims=True)).astype(v.dtype), v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-2)

    grads = jax.grad(lambda q, k, v: jnp.sum(_chunked_attention(
        q, k, v, 16).astype(jnp.float32)), argnums=(0, 1, 2))(q, k, v)
    for g in grads:
        assert bool(jnp.all(jnp.isfinite(g.astype(jnp.float32))))


def test_flash_sgam_on_tpu_matches_exact_softmax():
    """SRADSGAN_TPU_SGAM_IMPL=flash: the TPU flash-attention wrapper
    (pad-to-tile + segment-id masking, ops/sgam_flash.py) equals the exact
    f32 softmax attention incl. dq/dk/dv.  Device-only — the Pallas kernel
    has no CPU lowering; scripts/tpu_kernel_goldens.py runs the same check
    at the flagship's N=2916 on hardware."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.ops.sgam_flash import (flash_position_attention,
                                             is_available)
    if not is_available():
        import pytest
        pytest.skip("TPU flash-attention kernel needs a TPU backend")

    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.normal(size=(2, 300, 8)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(2, 300, 8)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(2, 300, 64)), jnp.bfloat16)

    def exact(q, k, v):
        e = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                       k.astype(jnp.float32))
        a = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bqk,bkc->bqc", a, v.astype(jnp.float32))

    ref = np.asarray(exact(q, k, v))
    out = np.asarray(flash_position_attention(q, k, v), np.float32)
    np.testing.assert_allclose(out, ref, atol=2e-2 * np.abs(ref).max())

    gf = jax.grad(lambda *a: jnp.sum(
        flash_position_attention(*a).astype(jnp.float32) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    ge = jax.grad(lambda *a: jnp.sum(exact(*a) ** 2),
                  argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, ge):
        a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
        np.testing.assert_allclose(a, b, atol=4e-2 * np.abs(b).max())


def test_flash_sgam_pad_mask_logic_on_cpu(monkeypatch):
    """The pad/mask wrapper feeding the TPU flash kernel is exact in BOTH
    masking modes: running the flash module's own jnp reference
    (mha_reference) over the padded inputs reproduces the exact unscaled
    softmax attention on the unpadded shapes.  Covers the round-4
    ``bias``-column mask (default: padded keys get energy exactly -1e4 so
    their softmax weight flushes to 0.0 — no segment-id machinery) and the
    round-3 ``segments`` mode.  CPU-runnable — the device golden
    (scripts/tpu_kernel_goldens.py) exercises the real kernel end-to-end."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, mha_reference)
    from sradsgan_tpu.ops import sgam_flash

    rng = np.random.default_rng(11)
    for mode in ("bias", "segments"):
        monkeypatch.setenv("SRADSGAN_TPU_SGAM_MASK", mode)
        for n in (300, 640):  # pad 300->384; 640 -> block 512, pad 1024
            q = jnp.asarray(rng.normal(size=(2, n, 8)), jnp.float32)
            k = jnp.asarray(rng.normal(size=(2, n, 8)), jnp.float32)
            v = jnp.asarray(rng.normal(size=(2, n, 64)), jnp.float32)
            qp, kp, vp, ids, block = pad_for_kernel_checked(
                sgam_flash, q, k, v, mode)
            assert qp.shape[2] % block == 0 and block % 128 == 0
            seg = None if ids is None else SegmentIds(q=ids, kv=ids)
            out = mha_reference(qp, kp, vp, None, segment_ids=seg,
                                causal=False, sm_scale=1.0)[:, 0, :n, :64]

            e = jnp.einsum("bqd,bkd->bqk", q, k)
            ref = jnp.einsum("bqk,bkc->bqc", jax.nn.softmax(e, axis=-1), v)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=1e-4)


def pad_for_kernel_checked(sgam_flash, q, k, v, mode):
    qp, kp, vp, ids, block = sgam_flash.pad_for_kernel(q, k, v)
    if mode == "bias":
        assert ids is None, "bias mode must skip segment ids"
    else:
        assert ids is not None
    return qp, kp, vp, ids, block


def test_upsample_convt_formulation_matches_pixelshuffle(monkeypatch):
    """SRADSGAN_TPU_UPSAMPLE_IMPL=convt: the transposed-conv sub-pixel
    formulation (ops/pixelshuffle.subpixel_conv_transposed — one dilated
    conv instead of conv + the bandwidth-bound shuffle transpose copies the
    round-4 trace surfaced) is exact vs conv+PixelShuffle across the
    2^n / 3^n scale law, both sharing modes, with an identical param tree."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.nn.blocks import UpsampleHead

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 7, 7, 16)).astype(np.float32))
    for scale, share in [(2, True), (4, True), (3, False), (9, True)]:
        monkeypatch.setenv("SRADSGAN_TPU_UPSAMPLE_IMPL", "")
        m1 = UpsampleHead(16, scale, share_stages=share)
        p1 = m1.init(jax.random.PRNGKey(0), x)
        y1 = m1.apply(p1, x)
        monkeypatch.setenv("SRADSGAN_TPU_UPSAMPLE_IMPL", "convt")
        m2 = UpsampleHead(16, scale, share_stages=share)
        p2 = m2.init(jax.random.PRNGKey(0), x)
        assert jax.tree.structure(p1) == jax.tree.structure(p2)
        y2 = m2.apply(p1, x)
        np.testing.assert_allclose(np.asarray(y2), np.asarray(y1),
                                   atol=2e-5)


@pytest.mark.parametrize("mode", ["groups", "blocks"])
def test_scan_groups_formulation_matches_unrolled(monkeypatch, mode):
    """SRADSGAN_TPU_SCAN_GROUPS: the nn.scan-stacked formulation (round-5
    structural experiment against the RAB chain, docs/PERF.md) computes
    the identical function — unrolled params repack losslessly into the
    stacked tree (to_scan_params), outputs match to fp tolerance, and the
    round trip through from_scan_params is exact."""
    from sradsgan_tpu.models.sradsgan import (SRADSGANGenerator,
                                              from_scan_params,
                                              to_scan_params)

    n_groups, n_blocks = 3, 2
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 8, 8, 3)).astype(np.float32))

    monkeypatch.setenv("SRADSGAN_TPU_SCAN_GROUPS", "")
    m_ref = SRADSGANGenerator(scale=2, n_groups=n_groups, n_blocks=n_blocks)
    p_ref = m_ref.init(jax.random.PRNGKey(0), x, train=False)
    y_ref = m_ref.apply(p_ref, x, train=False)

    monkeypatch.setenv("SRADSGAN_TPU_SCAN_GROUPS", mode)
    m_scan = SRADSGANGenerator(scale=2, n_groups=n_groups, n_blocks=n_blocks)
    p_scan_init = m_scan.init(jax.random.PRNGKey(0), x, train=False)
    p_scan = {"params": to_scan_params(p_ref["params"], n_groups, n_blocks,
                                       blocks=(mode == "blocks"))}
    assert (jax.tree.structure(p_scan_init) == jax.tree.structure(p_scan))
    for a, b in zip(jax.tree.leaves(p_scan_init), jax.tree.leaves(p_scan)):
        assert a.shape == b.shape
    y_scan = m_scan.apply(p_scan, x, train=False)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_ref),
                               atol=2e-5)

    back = from_scan_params(p_scan["params"], n_groups, n_blocks,
                            blocks=(mode == "blocks"))
    for a, b in zip(jax.tree.leaves(back), jax.tree.leaves(p_ref["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
