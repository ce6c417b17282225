"""Multi-device Pallas fast paths: shard_map keeps the kernels on >1-chip
meshes (ops/spmd.py).

Round 3 gated every Pallas kernel to single-device meshes; these tests
exercise the round-4 shard_map wrap on the 8-device CPU mesh with the
Pallas interpreter (SRADSGAN_TPU_PALLAS_INTERPRET=1), validating that

- the plan logic picks direct / shard_map / jnp-fallback correctly, and
- the shard_mapped kernels are numerically identical to the jnp
  formulations for value AND gradient (the kernels are batch-parallel, so
  per-device execution must be exact, not approximate).

The real-TPU single-device goldens live in scripts/tpu_kernel_goldens.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sradsgan_tpu.ops.spmd import DIRECT, plan_batch_kernel
from sradsgan_tpu.parallel.mesh import active_mesh, create_mesh


@pytest.fixture
def interpret_env(monkeypatch):
    monkeypatch.setenv("SRADSGAN_TPU_PALLAS_INTERPRET", "1")


@pytest.fixture
def mesh8():
    mesh = create_mesh(8)
    assert mesh.devices.size == 8
    return mesh


def test_plan_batch_kernel(mesh8):
    # 8 devices + the full data mesh active: divisible batches shard_map
    assert plan_batch_kernel(16) is mesh8
    assert plan_batch_kernel(8) is mesh8
    # indivisible batch -> jnp fallback
    assert plan_batch_kernel(12) is None
    assert plan_batch_kernel(1) is None
    # a partial mesh (2 of 8 devices) must NOT be used for kernels
    create_mesh(2)
    assert plan_batch_kernel(16) is None
    create_mesh(8)  # restore for other tests


def test_fused_pool_sharded_matches_reference(interpret_env, mesh8):
    from sradsgan_tpu.ops.pallas.pooling import (_avg_max_reference,
                                                 fused_avg_max_pool)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 12, 12, 32)).astype(np.float32))
    assert plan_batch_kernel(16) is mesh8

    def loss_kernel(x):
        a, m = fused_avg_max_pool(x)
        return jnp.sum(a * 0.7 + m * 1.3)

    def loss_ref(x):
        a, m = _avg_max_reference(x)
        return jnp.sum(a * 0.7 + m * 1.3)

    (val_k, grad_k) = jax.value_and_grad(loss_kernel)(x)
    (val_r, grad_r) = jax.value_and_grad(loss_ref)(x)
    np.testing.assert_allclose(float(val_k), float(val_r), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad_k), np.asarray(grad_r),
                               atol=1e-6)


def test_slam_gate_sharded_matches_reference(interpret_env, mesh8,
                                             monkeypatch):
    monkeypatch.setenv("SRADSGAN_TPU_SLAM_IMPL", "pallas")
    from sradsgan_tpu.ops.pallas.slam import (_gate_reference, _pallas_ok,
                                              fused_spatial_gate)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 12, 12, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(7, 7, 2, 1)).astype(np.float32) * 0.3)
    assert _pallas_ok(x), "pallas path must engage under interpret + mesh"

    def loss_k(x, w):
        return jnp.sum(fused_spatial_gate(x, w) ** 2)

    def loss_r(x, w):
        return jnp.sum(_gate_reference(x, w) ** 2)

    val_k, (gx_k, gw_k) = jax.value_and_grad(loss_k, argnums=(0, 1))(x, w)
    val_r, (gx_r, gw_r) = jax.value_and_grad(loss_r, argnums=(0, 1))(x, w)
    # f32 accumulation order differs (stencil vs taps); not a sharding error
    np.testing.assert_allclose(float(val_k), float(val_r), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_k), np.asarray(gw_r),
                               rtol=1e-4, atol=1e-2)


def test_slam_gate_sharded_inside_jit_sharded_inputs(interpret_env, mesh8,
                                                     monkeypatch):
    """The production shape: kernel inside jit over mesh-sharded inputs."""
    monkeypatch.setenv("SRADSGAN_TPU_SLAM_IMPL", "pallas")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sradsgan_tpu.ops.pallas.slam import (_gate_reference,
                                              fused_spatial_gate)

    rng = np.random.default_rng(2)
    x = np.asarray(rng.normal(size=(16, 8, 8, 8)).astype(np.float32))
    w = np.asarray(rng.normal(size=(7, 7, 2, 1)).astype(np.float32) * 0.3)
    xd = jax.device_put(x, NamedSharding(mesh8, P("data")))
    wd = jax.device_put(w, NamedSharding(mesh8, P()))

    out_k = jax.jit(fused_spatial_gate)(xd, wd)
    out_r = _gate_reference(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               atol=1e-6)


def test_active_mesh_tracks_create_mesh():
    m = create_mesh(4)
    assert active_mesh() is m
    m2 = create_mesh(8)
    assert active_mesh() is m2
