"""What does an f32 matmul/conv cost on this chip vs bf16?

JAX's Precision.DEFAULT on TPU historically rounds f32 matmul operands to
bf16 (1 MXU pass); HIGHEST runs an exact multi-pass decomposition.  The
discriminator computes in f32 — whether its convs are 1-pass or
multi-pass decides where its ~38 ms goes.  Fetch-bounded timing.
"""
import json
import time

import numpy as np


def time_chain(make, reps=20):
    import jax.numpy as jnp

    def sync(o):  # SCALAR device->host fetch (whole-array pulls ride the
        return float(jnp.sum(o.astype(jnp.float32)))  # slow dev tunnel)

    out = make()
    sync(out)  # warm + hard sync
    t0 = time.perf_counter()
    for _ in range(reps):
        out = make()
    sync(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()

    n = 4096
    reps = 8
    a32 = jnp.asarray(np.random.default_rng(0).random((n, n), np.float32))
    a16 = a32.astype(jnp.bfloat16)
    flops = reps * 2 * n ** 3

    def chain(x, precision):
        for _ in range(reps):
            x = jnp.dot(x, x, precision=precision)
            x = x / jnp.max(jnp.abs(x))
        return x

    for name, arr, prec in (
            ("bf16_default", a16, None),
            ("f32_default", a32, None),
            ("f32_highest", a32, jax.lax.Precision.HIGHEST),
    ):
        fn = jax.jit(lambda x, p=prec: chain(x, p))
        dt = time_chain(lambda: fn(arr))
        print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2),
                          "tflops": round(flops / dt / 1e12, 1)}), flush=True)

    # conv: the D's biggest block shape (216^2 stride-1 3x3 at 64ch)
    x32 = jnp.asarray(np.random.default_rng(1).random((16, 216, 216, 64),
                                                      np.float32))
    k32 = jnp.asarray(np.random.default_rng(2).random((3, 3, 64, 64),
                                                      np.float32) * 0.01)
    cflops = 16 * 216 * 216 * 9 * 64 * 64 * 2

    def conv(x, k, precision):
        import jax.lax as lax
        return lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)

    for name, xx, kk, prec in (
            ("conv_bf16", x32.astype(jnp.bfloat16), k32.astype(jnp.bfloat16),
             None),
            ("conv_f32_default", x32, k32, None),
            ("conv_f32_highest", x32, k32, jax.lax.Precision.HIGHEST),
    ):
        fn = jax.jit(lambda x, k, p=prec: conv(x, k, p))
        dt = time_chain(lambda: fn(xx, kk))
        print(json.dumps({"probe": name, "ms": round(dt * 1e3, 2),
                          "tflops": round(cflops / dt / 1e12, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
