"""AUTO-layout experiment: does letting XLA choose input/output layouts for
the train-step remove the per-step parameter relayout copies?

Round-4 trace finding (scripts/trace_step.py): the 86 ms flagship x4 step
spends ~4.6 ms in ~3400 `copy` ops/step — mostly small parameter/optimizer
relayouts (e.g. f32[3,3,256,64] {3,2,1,0} -> {2,3,1,0}) because the state
arrives in JAX's default layouts while XLA wants conv-friendly kernel
layouts inside the program.  Requesting `Layout.AUTO` for the jitted step's
inputs/outputs and device_put-ting the state into the compiler-chosen
formats once before the loop should make the steady-state step copy-free.

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/layout_probe.py [steps]
On CPU (API mechanics smoke):
    XLA_FLAGS=--xla_force_host_platform_device_count=1 JAX_PLATFORMS=cpu \
        python scripts/layout_probe.py 3 --cpu
"""
import json
import sys
import time

import numpy as np


def main(steps=100):
    import jax
    from jax.experimental.layout import Format, Layout

    from sradsgan_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    cfg.data.crop_size = 216
    cfg.data.batch_size = 16
    cfg.save_dir = "/tmp/sradsgan_layout_probe"
    if "--cpu" in sys.argv:
        cfg.data.crop_size = 64
        cfg.model_kwargs = {"n_groups": 1, "n_blocks": 1}
        jax.config.update("jax_platforms", "cpu")
    trainer = Trainer(cfg)

    rng = np.random.default_rng(0)
    cs = cfg.data.crop_size
    batch = shard_batch({
        "lr": rng.random((16, cs // 4, cs // 4, 3)).astype(np.float32),
        "hr": rng.random((16, cs, cs, 3)).astype(np.float32),
        "bc": rng.random((16, cs, cs, 3)).astype(np.float32),
    }, trainer.mesh)
    keys = [jax.device_put(k) for k in
            np.asarray(jax.random.split(jax.random.PRNGKey(0), steps + 4))]

    auto = Format(Layout.AUTO)
    step_auto = jax.jit(trainer._train_step, donate_argnums=(0,),
                        in_shardings=auto, out_shardings=auto)
    t0 = time.time()
    absify = lambda tree: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)
    lowered = step_auto.lower(absify(trainer.state), absify(batch),
                              absify(keys[0]))
    compiled = lowered.compile()
    print(f"# compile wall {time.time() - t0:.0f}s", flush=True)

    in_fmt = compiled.input_formats[0]
    state_fmt, batch_fmt, key_fmt = in_fmt
    state = jax.device_put(trainer.state, state_fmt)
    batch = jax.device_put(batch, batch_fmt)

    def fetch(out):
        return float(out[1]["loss_G"])

    ki = iter(keys)
    out = None
    for _ in range(3):
        st_out = compiled(state, batch, next(ki))
        state, out = st_out
    fetch((None, out))

    t0 = time.perf_counter()
    for _ in range(steps):
        state, out = compiled(state, batch, next(ki))
    loss = fetch((None, out))
    dt = (time.perf_counter() - t0) / steps
    mp = 16 * cs * cs / dt / 1e6
    print(json.dumps({"variant": "auto_layout", "ms_per_step":
                      round(dt * 1e3, 2), "mp_s": round(mp, 3),
                      "loss_G": loss}), flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 100
    main(n)
