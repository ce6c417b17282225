"""Full-size flagship train step on the 8-device CPU mesh (VERDICT r4
item 5).

The driver's dryrun_multichip validates the sharded step on a TOY model
(n_groups=1, crop 16).  This script runs the PRODUCTION-size SRADSGAN x4
WGAN-GP step — 12 groups x 3 RABs, 54^2 trunk (216^2 HR crops), bf16 G +
f32-BN bf16-conv D, the exact bench.py architecture — sharded over the
8-device virtual CPU mesh with the Pallas fast paths kept live through
the shard_map wrap (ops/spmd.py) in interpreter mode
(SRADSGAN_TPU_PALLAS_INTERPRET=1).  Proves the wrap composes at the shapes
a real v5e-8 would run, not just the toy dryrun:

- plan_batch_kernel must return the 8-device mesh (shard_map path);
- the jitted step must compile AND execute with every loss finite;
- the param tree must be fully replicated and the batch fully sharded
  (leaf counts printed for the record).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      SRADSGAN_TPU_PALLAS_INTERPRET=1 python scripts/fullsize_mesh_step.py
"""
import json
import os
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               ).strip()
os.environ.setdefault("SRADSGAN_TPU_PALLAS_INTERPRET", "1")

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")

    from sradsgan_tpu.core.config import config_for_model
    from sradsgan_tpu.ops.spmd import plan_batch_kernel
    from sradsgan_tpu.parallel.mesh import shard_batch
    from sradsgan_tpu.train.trainer import Trainer

    n = jax.device_count()
    assert n == 8, f"expected the 8-device CPU mesh, got {n}"

    cfg = config_for_model("sradsgan", 4)     # FULL SIZE: 12 groups x 3 RABs
    cfg.num_devices = n
    cfg.data.crop_size = 216                  # 54^2 trunk — the bench shape
    cfg.data.batch_size = 8                   # 1 image per device
    cfg.save_dir = "/tmp/sradsgan_fullsize_mesh"
    trainer = Trainer(cfg)

    plan = plan_batch_kernel(cfg.data.batch_size)
    assert plan is trainer.mesh, (
        f"Pallas kernels must take the shard_map path on this mesh: {plan}")

    # Sharding audit: params replicated, batch sharded over the data axis.
    def sharding_kinds(tree):
        kinds = {"replicated": 0, "sharded": 0}
        for leaf in jax.tree.leaves(tree):
            spec = getattr(leaf.sharding, "spec", None)
            if spec and any(s is not None for s in spec):
                kinds["sharded"] += 1
            else:
                kinds["replicated"] += 1
        return kinds

    rng = np.random.default_rng(0)
    batch = shard_batch({
        "lr": rng.random((8, 54, 54, 3)).astype(np.float32),
        "hr": rng.random((8, 216, 216, 3)).astype(np.float32),
        "bc": rng.random((8, 216, 216, 3)).astype(np.float32),
    }, trainer.mesh)

    t0 = time.time()
    state, metrics = trainer._jit_step(trainer.state, batch,
                                       jax.random.PRNGKey(0))
    out = {k: float(v) for k, v in metrics.items()}
    wall = time.time() - t0
    assert all(np.isfinite(v) for v in out.values()), out

    param_kinds = sharding_kinds(state.g_params)
    batch_kinds = sharding_kinds(batch)
    print(json.dumps({
        "devices": n, "model": "sradsgan x4 FULL (12 groups x 3 RABs)",
        "batch": 8, "crop": 216, "pallas": "interpret+shard_map",
        "losses": {k: round(v, 4) for k, v in out.items()},
        "g_param_leaves": param_kinds, "batch_leaves": batch_kinds,
        "compile_plus_step_s": round(wall, 1),
    }))


if __name__ == "__main__":
    main()
