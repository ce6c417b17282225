"""SpatialGate variants timed as a 20-deep chain inside ONE jit (isolates
per-instance cost from the ~0.6 ms dispatch overhead of this environment's
remote-TPU relay)."""

import json
import time

import numpy as np

N = 20


def timeit(fn, *args, steps=30, warmup=3):
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

        def chain(f):
            def run(x):
                y = x
                for _ in range(N):
                    y = f(y) + 0.01 * x  # keep live, prevent folding
                return y
            return run

        v1 = chain(lambda y: gate.apply(variables, y))
        v2 = chain(lambda y: spatial_gate_apply(y, kern))
        ident = chain(lambda y: y * 1.000001)

        base_f = timeit(jax.jit(ident), x)
        base_b = timeit(jax.jit(jax.grad(
            lambda x: jnp.sum(ident(x).astype(jnp.float32)))), x)
        res = {"shape": list(shape), "dtype": str(dtype.__name__)}
        for name, fn in [("v1", v1), ("v2", v2)]:
            tf = timeit(jax.jit(fn), x)
            tb = timeit(jax.jit(jax.grad(
                lambda x: jnp.sum(fn(x).astype(jnp.float32)))), x)
            res[f"{name}_fwd_us"] = round((tf - base_f) / N * 1e6, 1)
            res[f"{name}_fwdbwd_us"] = round((tb - base_b) / N * 1e6, 1)
        res["base_f_us"] = round(base_f * 1e6, 1)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
