"""Pallas kernel tests (run against the jnp fallback on the CPU mesh;
numerical-parity of the TPU path is asserted in the kernel benchmark)."""

import numpy as np

import jax
import jax.numpy as jnp

from sradsgan_tpu.ops.pallas.pooling import (_avg_max_reference,
                                             fused_avg_max_pool)


def test_fused_pool_matches_reference():
    x = jax.random.uniform(jax.random.PRNGKey(0), (4, 12, 12, 64))
    a1, m1 = fused_avg_max_pool(x)
    a2, m2 = _avg_max_reference(x)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), atol=1e-6)


def test_fused_pool_grad_matches_reference():
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 16))

    def f(pool):
        return lambda x: jnp.sum(pool(x)[0] * 2.0 + pool(x)[1] * 0.5)

    g1 = jax.grad(f(fused_avg_max_pool))(x)
    g2 = jax.grad(f(_avg_max_reference))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def _conv_gate_reference(x, w):
    """The original nn.Conv-style formulation (plain autodiff-able jnp)."""
    s = jnp.concatenate([jnp.mean(x, axis=-1, keepdims=True),
                         jnp.max(x, axis=-1, keepdims=True)], axis=-1)
    s = jax.lax.conv_general_dilated(
        s.astype(jnp.float32), w.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.sigmoid(s) * x.astype(jnp.float32)


def test_fused_spatial_gate_matches_conv_formulation():
    from sradsgan_tpu.ops.pallas.slam import fused_spatial_gate
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 12, 12, 16))
    w = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 2, 1)) * 0.05
    ours = np.asarray(fused_spatial_gate(x, w))
    ref = np.asarray(_conv_gate_reference(x, w))
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_stat_conv_lane_padding_identity():
    """The lane-padded stat conv (_stat_conv) must equal the raw 2-lane
    conv at every batch size the round-3 miscompile matrix exercised.

    The padding exists because the raw conv miscompiles ON TPU at batch
    2/4 when fused into the full generator graph (docs/VALIDATION.md
    round-3 found-and-fixed); CPU can only lock the math identity, and
    the hardware goldens (scripts/tpu_kernel_goldens.py) plus the eval
    sweep cover the device behavior."""
    from sradsgan_tpu.ops.pallas.slam import _gate_conv_reference, \
        _gate_reference, _bwd_jnp
    w = jax.random.normal(jax.random.PRNGKey(5), (7, 7, 2, 1)) * 0.05
    for b in (1, 2, 4, 16):
        x = jax.random.uniform(jax.random.PRNGKey(b), (b, 11, 13, 16))
        np.testing.assert_allclose(np.asarray(_gate_conv_reference(x, w)),
                                   np.asarray(_gate_reference(x, w)),
                                   atol=2e-6)
        g = jax.random.normal(jax.random.PRNGKey(b + 50), x.shape)
        dx1, dw1 = _bwd_jnp(x, w, g)
        dx2, dw2 = jax.vjp(_gate_reference, x, w)[1](g)
        np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2),
                                   atol=2e-4)


def test_fused_spatial_gate_grads_match_autodiff():
    """The custom VJP (incl. tie-split max backward and the dw contraction)
    must equal plain autodiff of the same math."""
    from sradsgan_tpu.ops.pallas.slam import fused_spatial_gate
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 10, 10, 8))
    # force max ties in some positions
    x = x.at[:, :2, :2, :4].set(0.75)
    w = jax.random.normal(jax.random.PRNGKey(3), (7, 7, 2, 1)) * 0.05

    def loss_fused(x, w):
        return jnp.sum(fused_spatial_gate(x, w).astype(jnp.float32) ** 2)

    def loss_ref(x, w):
        return jnp.sum(_conv_gate_reference(x, w) ** 2)

    gx1, gw1 = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=1e-4,
                               rtol=1e-5)


def test_spatial_gate_module_uses_fused_op_and_same_params():
    """SpatialGate keeps the Conv_0/kernel param path after the fusion."""
    from sradsgan_tpu.nn.attention import SpatialGate
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 8, 8, 4))
    gate = SpatialGate()
    v = gate.init(jax.random.PRNGKey(5), x)
    assert v["params"]["Conv_0"]["kernel"].shape == (7, 7, 2, 1)
    out = gate.apply(v, x)
    ref = _conv_gate_reference(x, v["params"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fused_spatial_gate_second_order_matches_autodiff():
    """WGAN-GP differentiates THROUGH the D's gate gradients (grad-of-grad,
    losses/gan.py); the fused op's second-order rule must match plain
    autodiff of the conv formulation."""
    from sradsgan_tpu.ops.pallas.slam import fused_spatial_gate
    x = jax.random.uniform(jax.random.PRNGKey(6), (2, 9, 9, 8))
    w = jax.random.normal(jax.random.PRNGKey(7), (7, 7, 2, 1)) * 0.05

    def gp_like(gate_fn):
        def f(x, w):
            g = jax.grad(lambda xi: jnp.sum(
                gate_fn(xi, w).astype(jnp.float32)))(x)
            norm = jnp.sqrt(jnp.sum(g.astype(jnp.float32) ** 2, axis=-1)
                            + 1e-12)
            return jnp.mean((norm - 1.0) ** 2)
        return f

    gx1, gw1 = jax.grad(gp_like(fused_spatial_gate), argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(gp_like(_conv_gate_reference), argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), atol=2e-5)


def test_slam_impl_dispatch_equivalence(monkeypatch):
    """Every SRADSGAN_TPU_SLAM_IMPL formulation computes the same gate
    (values to fp tolerance, gradients through the custom VJP)."""
    import jax
    import jax.numpy as jnp

    from sradsgan_tpu.ops.spatial_gate import spatial_gate_apply

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 12, 12, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((7, 7, 2, 1)) * 0.2, jnp.float32)

    def run(impl):
        monkeypatch.setenv("SRADSGAN_TPU_SLAM_IMPL", impl)

        def loss(x, w):
            return jnp.sum(spatial_gate_apply(x, w) ** 2)

        out = spatial_gate_apply(x, w)
        gx, gw = jax.grad(loss, argnums=(0, 1))(x, w)
        return np.asarray(out), np.asarray(gx), np.asarray(gw)

    ref = run("autodiff-taps")
    for impl in ("taps", "conv", "pallas"):  # pallas falls back off-TPU
        got = run(impl)
        for r, g in zip(ref, got):
            np.testing.assert_allclose(g, r, atol=2e-4, rtol=2e-4)


def test_fused_rab_tail_matches_unfused(monkeypatch):
    """SRADSGAN_TPU_RAB_TAIL=fused: the megakernel path (jnp fallback off
    TPU) equals the unfused LocalAttention composition — identical param
    tree, identical forward, grads to reduction-order noise — with a LIVE
    CLAM hidden unit so the MLP backward is actually exercised."""
    import os
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.models.sradsgan import RAB

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 12, 12, 16)).astype(np.float32))
    rab = RAB(features=16)
    params = rab.init(jax.random.PRNGKey(0), x)
    la = params["params"]["LocalAttention_0"]["ChannelGate_0"]
    la["Dense_0"]["kernel"] = jnp.abs(la["Dense_0"]["kernel"]) + 0.05
    la["Dense_1"]["kernel"] = la["Dense_1"]["kernel"] + 0.1

    def run(p, fused):
        if fused:
            monkeypatch.setenv("SRADSGAN_TPU_RAB_TAIL", "fused")
        else:
            monkeypatch.delenv("SRADSGAN_TPU_RAB_TAIL", raising=False)
        return RAB(features=16).apply(p, x)

    base = run(params, False)
    fused_params = RAB(features=16).init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(fused_params))
    fused = run(params, True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               atol=1e-6)

    g_u = jax.grad(lambda p: jnp.sum(run(p, False) ** 2))(params)
    g_f = jax.grad(lambda p: jnp.sum(run(p, True) ** 2))(params)
    for a, b in zip(jax.tree.leaves(g_u), jax.tree.leaves(g_f)):
        scale = max(float(jnp.max(jnp.abs(a))), 1e-6)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale, atol=1e-5)
    # CLAM MLP grads are alive (the zero-grad dead-unit case would
    # vacuously pass)
    assert float(jnp.max(jnp.abs(
        g_u["params"]["LocalAttention_0"]["ChannelGate_0"]["Dense_0"]
        ["kernel"]))) > 1e-4
