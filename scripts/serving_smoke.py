"""Serving-path latency/throughput on hardware (fetch-bounded timing).

Measures the shape-bucketed Predictor (serving.py) on the flagship x4:
single 54->216 image latency and batch-16 throughput, bf16 and f32.
The reference has no serving story; this is the deployment surface's
on-hardware evidence for docs/PERF.md.
"""

import json
import time

import numpy as np


def timeit(fn, x, steps=30, warmup=3):
    for _ in range(warmup):
        out = fn(x)
    float(np.asarray(out).ravel()[0])  # predictor returns numpy (synced)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = fn(x)
    float(np.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from sradsgan_tpu.core.cache import enable_compilation_cache
    from sradsgan_tpu.models import create_generator
    from sradsgan_tpu.serving import Predictor
    enable_compilation_cache()

    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", None)):
        gen = create_generator("sradsgan", 4, dtype=dtype)
        x0 = jnp.zeros((1, 54, 54, 3), jnp.float32)
        variables = gen.init(jax.random.PRNGKey(0), x0, train=False)
        pred = Predictor(gen, variables, scale=4)
        rng = np.random.default_rng(0)

        one = rng.random((1, 54, 54, 3)).astype(np.float32)
        dt1 = timeit(pred, one)
        batch = rng.random((16, 54, 54, 3)).astype(np.float32)
        dt16 = timeit(pred, batch)
        print(json.dumps({
            "serving_dtype": dtype_name,
            "latency_ms_1x54": round(dt1 * 1e3, 2),
            "ms_16x54": round(dt16 * 1e3, 2),
            "mps_out": round(16 * 216 * 216 / 1e6 / dt16, 2)}), flush=True)


if __name__ == "__main__":
    main()
