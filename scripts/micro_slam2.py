"""Compare the stock SpatialGate lowering vs the layout-restructured one."""

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

    from sradsgan_tpu.core.cache import enable_compilation_cache
    from sradsgan_tpu.nn.attention import SpatialGate
    from sradsgan_tpu.ops.spatial_gate import spatial_gate_apply
    enable_compilation_cache()

    for shape, dtype in [((16, 54, 54, 64), jnp.bfloat16),
                         ((16, 27, 27, 256), jnp.float32)]:
        x = jnp.asarray(
            np.random.default_rng(0).random(shape, np.float32), dtype)
        gate = SpatialGate(dtype=dtype)
        variables = gate.init(jax.random.PRNGKey(0), x)
        kern = variables["params"]["Conv_0"]["kernel"]

        def v1(x):
            return gate.apply(variables, x)

        def v2(x):
            return spatial_gate_apply(x, kern)

        # numerics
        a = np.asarray(v1(x), np.float32)
        c = np.asarray(v2(x), np.float32)
        err = float(np.max(np.abs(a - c)))

        res = {
            "shape": list(shape), "dtype": str(dtype.__name__),
            "max_abs_diff": err,
            "v1_fwd_us": round(timeit(jax.jit(v1), x) * 1e6, 1),
            "v2_fwd_us": round(timeit(jax.jit(v2), x) * 1e6, 1),
            "v1_fwdbwd_us": round(timeit(jax.jit(jax.grad(
                lambda x: jnp.sum(v1(x).astype(jnp.float32)))), x) * 1e6, 1),
            "v2_fwdbwd_us": round(timeit(jax.jit(jax.grad(
                lambda x: jnp.sum(v2(x).astype(jnp.float32)))), x) * 1e6, 1),
        }
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
