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
        # Since this environment's jax regressed pallas_call's built-in JVP
        # (it asserts), the grad-of-grad tangent rides the jnp reference
        # while the primal/cotangent stay the Pallas kernel
        # (slam._fwd_pallas_jvpsafe): the kernel's ~3e-6 forward deviation
        # enters the cotangent and the second-order chain amplifies it, so
        # this check is looser than when the tangent was the kernel's own
        # (round-2: 8e-5).  The DEFAULT conv path's grad-of-grad remains
        # tight (tests/test_pallas_ops.py vs autodiff).
        check(f"slam_gog_{dtype.__name__}", gg / s2, rr / s2,
              max(tol * 8, 5e-3))

    # fused avg+max global pool (f32 path)
    x = jax.random.normal(key, (16, 54, 54, 64), jnp.float32)
    avg, mx = jax.jit(fused_avg_max_pool)(x)
    check("pool_avg", avg, jnp.mean(x, axis=(1, 2)), 1e-5)
    check("pool_max", mx, jnp.max(x, axis=(1, 2)), 0.0)
    rab_tail_goldens()
    flash_sgam_goldens()
    print(json.dumps({"kernel_goldens": "ok"}), flush=True)


def flash_sgam_goldens():
    """Flash SGAM (TPU flash-attention kernel + pad/mask wrapper) vs the
    exact f32 softmax, incl. dq/dk/dv, at the flagship's N=2916."""
    from sradsgan_tpu.ops.sgam_flash import flash_position_attention

    def exact(q, k, v):
        e = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                       k.astype(jnp.float32))
        a = jax.nn.softmax(e, axis=-1)
        return jnp.einsum("bqk,bkc->bqc", a, v.astype(jnp.float32))

    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 2e-2)):
        q = jax.random.normal(kq, (2, 2916, 8), dtype)
        k = jax.random.normal(kk, (2, 2916, 8), dtype)
        v = jax.random.normal(kv, (2, 2916, 64), dtype)
        ref = jax.jit(exact)(q, k, v)
        out = jax.jit(flash_position_attention)(q, k, v)
        s = float(jnp.max(jnp.abs(ref))) + 1e-6
        check(f"flash_sgam_fwd_{dtype.__name__}",
              out.astype(jnp.float32) / s, ref / s, tol)

        def loss_f(q, k, v):
            return jnp.sum(flash_position_attention(q, k, v)
                           .astype(jnp.float32) ** 2)

        def loss_e(q, k, v):
            return jnp.sum(exact(q, k, v) ** 2)

        gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
        ge = jax.jit(jax.grad(loss_e, argnums=(0, 1, 2)))(q, k, v)
        for name, a, b in zip(("dq", "dk", "dv"), gf, ge):
            s = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6
            check(f"flash_sgam_{name}_{dtype.__name__}",
                  a.astype(jnp.float32) / s, b.astype(jnp.float32) / s,
                  tol * 4)




def rab_tail_goldens():
    """Fused RAB-tail megakernel vs the jnp reference, on device."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.ops.pallas import rab_tail

    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 8)
    # f32 tolerance reflects matmul OPERAND precision, not math: the jnp
    # reference's fuse conv runs at XLA DEFAULT precision (bf16 operands,
    # f32 accumulate) while the kernel makes the same rounding explicitly —
    # reduction orders differ at the bf16-rounding scale.  Exact-math
    # equivalence is proven on CPU (tests/test_pallas_ops.py).
    for dtype, tol in ((jnp.float32, 5e-3), (jnp.bfloat16, 2e-2)):
        c, hidden = 64, 4
        t = jax.random.normal(ks[0], (4, 54, 54, c), jnp.float32).astype(dtype)
        xr = jax.random.normal(ks[1], (4, 54, 54, c), jnp.float32).astype(dtype)
        w1 = jax.random.normal(ks[2], (c, hidden)) * 0.3
        w2 = jax.random.normal(ks[3], (hidden, c)) * 0.3
        slam_w = jax.random.normal(ks[4], (7, 7, 2, 1)) * 0.1
        fuse_w = jax.random.normal(ks[5], (c, c)) * 0.05
        fuse_b = jax.random.normal(ks[6], (c,)) * 0.1
        args = (t, xr, w1, w2, slam_w, fuse_w, fuse_b)

        out = jax.jit(rab_tail.fused_rab_tail)(*args)
        ref = jax.jit(lambda *a: rab_tail._forward_jnp(*a)[0])(*args)
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-6
        check(f"rab_tail_fwd_{dtype.__name__}",
              out.astype(jnp.float32) / scale,
              ref.astype(jnp.float32) / scale, tol)

        def loss_fused(*a):
            return jnp.sum(rab_tail.fused_rab_tail(*a).astype(jnp.float32) ** 2)

        def loss_ref(*a):
            return jnp.sum(rab_tail._forward_jnp(*a)[0].astype(jnp.float32) ** 2)

        gf = jax.jit(jax.grad(loss_fused, argnums=tuple(range(7))))(*args)
        gr = jax.jit(jax.grad(loss_ref, argnums=tuple(range(7))))(*args)
        for i, (a, b) in enumerate(zip(gf, gr)):
            s = float(jnp.max(jnp.abs(b.astype(jnp.float32)))) + 1e-6
            check(f"rab_tail_g{i}_{dtype.__name__}",
                  a.astype(jnp.float32) / s, b.astype(jnp.float32) / s,
                  tol * 8)


if __name__ == "__main__":
    main()
