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

        # Device-resident compute (scalar fetch only): isolates the TPU
        # forward from the environment's host<->device tunnel, which moves
        # image payloads at only ~10 MB/s and dominates the end-to-end
        # numbers above.
        fwd = jax.jit(lambda v, x: jnp.sum(
            gen.apply(v, x, train=False).astype(jnp.float32)))

        def run_dev(x):
            # Pipelined: 20 queued forwards, ONE closing fetch — the device
            # executes serially, so the window bounds all 20; a per-call
            # fetch would add the relay's ~20-40 ms round trip each time.
            dx = jnp.asarray(x)
            float(fwd(variables, dx))
            t0 = time.perf_counter()
            out = None
            for _ in range(20):
                out = fwd(variables, dx)
            float(out)
            return (time.perf_counter() - t0) / 20

        dev1 = run_dev(one)
        dev16 = run_dev(batch)
        print(json.dumps({
            "serving_dtype": dtype_name,
            "e2e_ms_1x54": round(dt1 * 1e3, 2),
            "e2e_ms_16x54": round(dt16 * 1e3, 2),
            "device_ms_1x54": round(dev1 * 1e3, 2),
            "device_ms_16x54": round(dev16 * 1e3, 2),
            "device_mps_out": round(16 * 216 * 216 / 1e6 / dev16, 2)}),
            flush=True)


if __name__ == "__main__":
    main()
