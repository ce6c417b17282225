"""Chip sanity: achievable matmul TFLOP/s, and conv strategies compared.

- matmul chain: what the MXU actually delivers here
- lax conv (XLA default) vs conv expressed as 9 shifted 1x1 matmuls
"""

import json
import time

import numpy as np


def timeit(fn, *args, steps=20, warmup=3):
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
    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # --- pure matmul peak (bf16) ---
    m = k = n = 4096
    a = jnp.asarray(rng.random((m, k), np.float32), jnp.bfloat16)
    w1 = jnp.asarray(rng.random((k, n), np.float32) * 0.01, jnp.bfloat16)
    w2 = jnp.asarray(rng.random((n, k), np.float32) * 0.01, jnp.bfloat16)

    def mm_chain(a):
        y = a
        for _ in range(10):
            y = y @ w1
            y = y @ w2
        return y

    t = timeit(jax.jit(mm_chain), a)
    flops = 20 * 2 * m * k * n
    print(json.dumps({"name": "matmul4096_bf16",
                      "tflops": round(flops / t / 1e12, 1)}), flush=True)

    # --- conv strategies at the RAB shape ---
    B, H, W, Cin, Cout = 16, 54, 54, 64, 256
    x = jnp.asarray(rng.random((B, H, W, Cin), np.float32), jnp.bfloat16)
    kern = jnp.asarray(rng.random((3, 3, Cin, Cout), np.float32) * 0.01,
                       jnp.bfloat16)
    kern_back = jnp.asarray(rng.random((3, 3, Cout, Cin), np.float32) * 0.01,
                            jnp.bfloat16)

    def conv_xla(x, k, cout):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def pair_xla(x):
        y = x
        for _ in range(12):
            h = jax.nn.leaky_relu(conv_xla(y, kern, Cout), 0.2)
            y = conv_xla(h, kern_back, Cin) + y
        return y

    def conv_taps(x, k):
        # 3x3 SAME conv as 9 shifted (BHW, Cin)@(Cin, Cout) matmuls
        b, h, w, cin = x.shape
        cout = k.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((b, h, w, cout), jnp.float32)
        for dh in range(3):
            for dw in range(3):
                acc = acc + jnp.einsum(
                    "bhwc,co->bhwo", xp[:, dh:dh + h, dw:dw + w, :],
                    k[dh, dw], preferred_element_type=jnp.float32)
        return acc.astype(x.dtype)

    def pair_taps(x):
        y = x
        for _ in range(12):
            h = jax.nn.leaky_relu(conv_taps(y, kern), 0.2)
            y = conv_taps(h, kern_back) + y
        return y

    for name, fn in [("pair_xla", pair_xla), ("pair_taps", pair_taps)]:
        tf = timeit(jax.jit(fn), x)
        tb = timeit(jax.jit(jax.grad(
            lambda x: jnp.sum(fn(x).astype(jnp.float32)))), x)
        gf = 12 * 2 * (2 * B * H * W * 9 * Cin * Cout)
        print(json.dumps({
            "name": name,
            "fwd_us_per_pair": round(tf / 12 * 1e6, 1),
            "fwdbwd_us_per_pair": round(tb / 12 * 1e6, 1),
            "fwd_tflops": round(gf / 2 / tf / 1e12, 1)}), flush=True)


if __name__ == "__main__":
    main()
