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
