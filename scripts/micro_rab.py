"""Chained RAB-component benchmarks: where do the generator's 58 ms go?

Chains N=12 instances inside one jit to amortize the ~0.6 ms relay dispatch.
"""

import json
import time

import numpy as np

N = 12


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
    from flax import linen as nn

    from sradsgan_tpu.core.cache import enable_compilation_cache
    from sradsgan_tpu.models.sradsgan import RAB
    enable_compilation_cache()

    rng = np.random.default_rng(0)

    def bench(name, module, shape, dtype):
        x = jnp.asarray(rng.random(shape, np.float32), dtype)
        variables = module.init(jax.random.PRNGKey(0), x)

        def run(x):
            y = x
            for _ in range(N):
                y = module.apply(variables, y) + 0.01 * x
            return y

        tf = timeit(jax.jit(run), x)
        tb = timeit(jax.jit(jax.grad(
            lambda x: jnp.sum(run(x).astype(jnp.float32)))), x)
        print(json.dumps({
            "name": name, "shape": list(shape), "dtype": dtype.__name__,
            "fwd_us_per_inst": round(tf / N * 1e6, 1),
            "fwdbwd_us_per_inst": round(tb / N * 1e6, 1)}), flush=True)

    class ConvPair(nn.Module):
        feats: int = 64
        expand: int = 4
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x):
            y = nn.Conv(self.feats * self.expand, (3, 3), padding="SAME",
                        dtype=self.dtype)(x)
            y = nn.leaky_relu(y, 0.2)
            return nn.Conv(self.feats, (3, 3), padding="SAME",
                           dtype=self.dtype)(y)

    bench("convpair_54_bf16", ConvPair(), (16, 54, 54, 64), jnp.bfloat16)
    bench("convpair_54_f32", ConvPair(dtype=None), (16, 54, 54, 64),
          jnp.float32)
    bench("convpair_56_bf16", ConvPair(), (16, 56, 56, 64), jnp.bfloat16)
    bench("convpair_64sp_bf16", ConvPair(), (16, 64, 64, 64), jnp.bfloat16)
    bench("convpair_c128_bf16", ConvPair(feats=128, expand=2),
          (16, 54, 54, 128), jnp.bfloat16)
    bench("rab_full_bf16", RAB(dtype=jnp.bfloat16), (16, 54, 54, 64),
          jnp.bfloat16)


if __name__ == "__main__":
    main()
