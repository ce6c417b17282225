"""Data-parallel correctness: the sharded step equals the single-device step.

The entire multi-chip story is batch sharding + XLA's gradient psum
(SURVEY.md §2.7); this checks the math end-to-end on the virtual mesh.
"""

import numpy as np

import jax

from sradsgan_tpu.core.config import config_for_model
from sradsgan_tpu.parallel.mesh import create_mesh, shard_batch
from sradsgan_tpu.train.trainer import Trainer


def _cfg(num_devices):
    cfg = config_for_model("edsr", 2)
    cfg.bf16 = False
    cfg.data.synthetic = True
    cfg.data.crop_size = 16
    cfg.data.batch_size = 8
    cfg.model_kwargs = {"base_filters": 8, "num_residuals": 1}
    cfg.num_devices = num_devices
    cfg.save_dir = "/tmp/shard_test"
    return cfg


def test_dp_step_matches_single_device():
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    rng = np.random.default_rng(0)
    batch = {
        "lr": rng.random((8, 8, 8, 3)).astype(np.float32),
        "hr": rng.random((8, 16, 16, 3)).astype(np.float32),
        "bc": rng.random((8, 16, 16, 3)).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)

    results = []
    for n_dev in (1, 8):
        trainer = Trainer(_cfg(n_dev))
        sharded = shard_batch(batch, trainer.mesh)
        state, metrics = trainer._jit_step(trainer.state, sharded, key)
        results.append((jax.tree.map(np.asarray, state.g_params),
                        float(metrics["loss_G"])))

    (p1, l1), (p8, l8) = results
    assert abs(l1 - l8) < 1e-6, (l1, l8)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, atol=1e-6)
