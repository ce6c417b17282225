"""On-device golden check for the Pallas kernels (SLAM gate + fused pool).

The CPU test suite exercises these in interpret/fallback mode; this script
verifies the real Mosaic-compiled kernels on the TPU against the jnp
reference formulation, including grads (the WGAN-GP path differentiates
through the gate twice).  Small shapes -> fast compile; run before the
full bench so a kernel miscompile is caught in seconds, not after a
multi-minute train-step compile.
"""

import json
import os

os.environ["SRADSGAN_TPU_SLAM_IMPL"] = "pallas"  # engage the kernels

import numpy as np

import jax
import jax.numpy as jnp


def check(name, a, b, tol):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    ok = err <= tol
    print(json.dumps({"check": name, "max_err": err, "tol": tol, "ok": ok}),
          flush=True)
    if not ok:
        raise SystemExit(f"{name} FAILED: {err} > {tol}")


def main():
    from sradsgan_tpu.ops.pallas import slam
    from sradsgan_tpu.ops.pallas.pooling import fused_avg_max_pool

    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}), flush=True)
    key = jax.random.PRNGKey(0)
    for dtype, tol in ((jnp.float32, 1e-5), (jnp.bfloat16, 2e-2)):
        k1, k2, key = jax.random.split(key, 3)
        x = jax.random.normal(k1, (4, 54, 54, 64), dtype)
        w = (jax.random.normal(k2, (7, 7, 2, 1), jnp.float32) * 0.2)

        ref = slam._gate_reference(x, w)
        out = jax.jit(slam.fused_spatial_gate)(x, w)
        check(f"slam_fwd_{dtype.__name__}", out, ref, tol)

        def loss_fused(x, w):
            return jnp.sum(slam.fused_spatial_gate(x, w).astype(jnp.float32) ** 2)

        def loss_ref(x, w):
            return jnp.sum(slam._gate_reference(x, w)
                           .astype(jnp.float32) ** 2)

        gx, gw = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(x, w)
        rx, rw = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, w)
        scale = float(jnp.max(jnp.abs(rx.astype(jnp.float32)))) + 1e-6
        check(f"slam_dx_{dtype.__name__}", gx / scale, rx / scale, tol * 4)
        wscale = float(jnp.max(jnp.abs(rw))) + 1e-6
        check(f"slam_dw_{dtype.__name__}", gw / wscale, rw / wscale, tol * 4)

        # grad-of-grad (the GP path)
        def gnorm(x, w):
            g = jax.grad(loss_fused)(x, w)
            return jnp.sum(g.astype(jnp.float32) ** 2)

        def gnorm_ref(x, w):
            g = jax.grad(loss_ref)(x, w)
            return jnp.sum(g.astype(jnp.float32) ** 2)

        gg = jax.jit(jax.grad(gnorm))(x, w)
        rr = jax.jit(jax.grad(gnorm_ref))(x, w)
        s2 = float(jnp.max(jnp.abs(rr.astype(jnp.float32)))) + 1e-6
        check(f"slam_gog_{dtype.__name__}", gg / s2, rr / s2, tol * 8)

    # fused avg+max global pool (f32 path)
    x = jax.random.normal(key, (16, 54, 54, 64), jnp.float32)
    avg, mx = jax.jit(fused_avg_max_pool)(x)
    check("pool_avg", avg, jnp.mean(x, axis=(1, 2)), 1e-5)
    check("pool_max", mx, jnp.max(x, axis=(1, 2)), 0.0)
    print(json.dumps({"kernel_goldens": "ok"}), flush=True)


if __name__ == "__main__":
    main()
