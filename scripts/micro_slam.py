"""Microbenchmark of the SLAM spatial gate at flagship shapes.

Times forward and forward+backward of the whole gate and its pieces at
(16, 54, 54, 64) bf16 to locate the cost before fusing.

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/micro_slam.py
"""

import json
import time

import numpy as np


def timeit(fn, *args, steps=50, warmup=3):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from sradsgan_tpu.core.cache import enable_compilation_cache
    from sradsgan_tpu.nn.attention import SpatialGate
    enable_compilation_cache()

    shape = (16, 54, 54, 64)
    x = jnp.asarray(np.random.default_rng(0).random(shape, np.float32),
                    jnp.bfloat16)

    gate = SpatialGate(dtype=jnp.bfloat16)
    variables = gate.init(jax.random.PRNGKey(0), x)
    w = variables["params"]["Conv_0"]["kernel"].astype(jnp.bfloat16)

    def full(x):
        return gate.apply(variables, x)

    def pools(x):
        return jnp.mean(x, axis=-1, keepdims=True), jnp.max(
            x, axis=-1, keepdims=True)

    def conv77(s):
        return jax.lax.conv_general_dilated(
            s, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def gated(x, g):
        return nn.sigmoid(g) * x

    s = jnp.concatenate(list(pools(x)), axis=-1)
    g = conv77(s)

    results = {}
    results["slam_fwd"] = timeit(jax.jit(full), x)
    results["slam_fwd_bwd"] = timeit(
        jax.jit(jax.grad(lambda x: jnp.sum(full(x).astype(jnp.float32)))), x)
    results["pools_fwd"] = timeit(jax.jit(pools), x)
    results["pools_fwd_bwd"] = timeit(
        jax.jit(jax.grad(lambda x: sum(
            jnp.sum(p.astype(jnp.float32)) for p in pools(x)))), x)
    results["conv77_fwd"] = timeit(jax.jit(conv77), s)
    results["conv77_fwd_bwd"] = timeit(
        jax.jit(jax.grad(lambda s: jnp.sum(conv77(s).astype(jnp.float32)))),
        s)
    results["gatemul_fwd"] = timeit(jax.jit(gated), x, g)
    results["gatemul_fwd_bwd"] = timeit(
        jax.jit(jax.grad(
            lambda x: jnp.sum(gated(x, g).astype(jnp.float32)))), x)

    for k, v in results.items():
        print(json.dumps({"op": k, "us": round(v * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    main()
