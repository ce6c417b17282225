"""End-to-end training smoke tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

from sradsgan_tpu.core.config import config_for_model
from sradsgan_tpu.train.trainer import Trainer


def _tiny_cfg(model, scale=2, **model_kwargs):
    cfg = config_for_model(model, scale)
    cfg.bf16 = False
    cfg.data.synthetic = True
    cfg.data.synthetic_size = 32
    cfg.data.crop_size = 32
    cfg.data.test_crop_size = 32
    cfg.data.batch_size = 8
    cfg.data.test_batch_size = 8
    cfg.data.num_workers = 2
    cfg.model_kwargs = model_kwargs
    cfg.save_dir = "/tmp/sradsgan_tpu_test"
    return cfg


def test_edsr_pixel_training_reduces_loss():
    cfg = _tiny_cfg("edsr", base_filters=16, num_residuals=2)
    cfg.optim.lr = 5e-3
    trainer = Trainer(cfg)
    import jax
    rng = jax.random.PRNGKey(0)
    from sradsgan_tpu.data.datasets import build_train_dataset
    from sradsgan_tpu.data.loader import DataLoader, device_prefetch
    ds = build_train_dataset(cfg.data, cfg.scale)
    losses = []
    for epoch in range(10):
        loader = DataLoader(ds, cfg.data.batch_size, num_workers=2,
                            seed=epoch)
        for batch in device_prefetch(iter(loader), trainer.mesh):
            batch.pop("path", None)
            rng, k = jax.random.split(rng)
            trainer.state, metrics = trainer._jit_step(trainer.state, batch, k)
            losses.append(float(metrics["loss_G"]))
    assert losses[-1] < losses[0] * 0.8, losses[:3] + losses[-3:]


def test_gan_training_step_runs_and_validates():
    cfg = _tiny_cfg("srgan", base_filters=8, num_residuals=1)
    cfg.sample_interval = 2  # exercise the TB image-summary sample path
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=3)
    assert "loss_G" in out and "loss_D" in out
    assert np.isfinite(out["loss_G"]) and np.isfinite(out["loss_D"])
    val = trainer.validate(max_batches=1)
    assert np.isfinite(val["psnr"]) and 0 < val["ssim"] <= 1


def test_wgan_gp_step_runs():
    cfg = _tiny_cfg("sradsgan", n_groups=1, n_blocks=1)
    cfg.data.crop_size = 24
    cfg.data.test_crop_size = 24
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=2)
    assert np.isfinite(out["loss_G"]) and np.isfinite(out["loss_D"])


def test_checkpoint_roundtrip_and_chain_init(tmp_path):
    cfg = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg.save_dir = str(tmp_path)
    trainer = Trainer(cfg)
    trainer.train(num_steps=1)
    path = trainer.save_checkpoint(0)

    # chain training: x2 checkpoint warm-starts an x4 model (upsample tail
    # differs; body restores)
    cfg4 = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg4.scale = 4
    cfg4.save_dir = str(tmp_path)
    cfg4.init_from = path
    trainer4 = Trainer(cfg4)
    out = trainer4.train(num_steps=1)
    assert np.isfinite(out["loss_G"])


def test_hat_trains_a_step():
    cfg = _tiny_cfg("hat", scale=2, embed_dim=12, depths=(1,),
                    num_heads=(2,), window_size=4)
    cfg.data.crop_size = 16
    cfg.data.test_crop_size = 16
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=2)
    assert np.isfinite(out["loss_G"])


def test_shared_upsample_param_counts():
    """share_stages=True reuses ONE conv across x4's two stages."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.nn.blocks import UpsampleHead

    x = jnp.zeros((1, 8, 8, 16))
    shared = UpsampleHead(16, 4, share_stages=True).init(
        jax.random.PRNGKey(0), x)
    fresh = UpsampleHead(16, 4, share_stages=False).init(
        jax.random.PRNGKey(0), x)
    n = lambda v: sum(p.size for p in jax.tree.leaves(v))
    assert n(fresh) == 2 * n(shared)
    # both upscale 4x
    assert UpsampleHead(16, 4, share_stages=True).apply(
        shared, x).shape == (1, 32, 32, 16)


def test_plateau_backtrack_halves_lr(monkeypatch, tmp_path):
    """After `patience` non-improving epochs the trainer reloads the best
    checkpoint and halves the lr (reference sradsgan.py:986-1036)."""
    import itertools

    from sradsgan_tpu.train.state import get_lr

    cfg = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg.save_dir = str(tmp_path)
    cfg.optim.plateau_patience = 2
    cfg.num_epochs = 6
    trainer = Trainer(cfg)

    vals = (30.0 - 0.5 * i for i in itertools.count())

    def fake_validate(max_batches=None):
        v = next(vals)
        return {"psnr": v, "ssim": v / 100, "ergas": 100.0 - v,
                "bc_psnr": 30.0, "bc_ssim": 0.9}

    monkeypatch.setattr(trainer, "validate", fake_validate)
    lr0 = get_lr(trainer.state.g_opt)
    trainer.train()
    assert get_lr(trainer.state.g_opt) <= lr0 * 0.5 + 1e-12


def test_plateau_rewind_and_history_pop(monkeypatch, tmp_path):
    """Exact reference backtrack (sradsgan.py:1012-1036): the epoch counter
    rewinds to best_epoch+1, `patience` metric-history entries pop, the G lr
    halves every plateau, and the D lr halves only once the pre-halving lr
    has dropped below 1e-4."""
    import itertools

    from sradsgan_tpu.train.state import get_lr

    cfg = _tiny_cfg("srgan", base_filters=8, num_residuals=1)
    cfg.save_dir = str(tmp_path)
    cfg.optim.plateau_patience = 2
    cfg.optim.lr = 2e-4
    cfg.num_epochs = 5
    cfg.data.synthetic_size = 8  # one step per epoch keeps this test fast
    trainer = Trainer(cfg)

    epochs_seen = []
    vals = (30.0 - 0.5 * i for i in itertools.count())

    def fake_validate(max_batches=None):
        v = next(vals)
        return {"psnr": v, "ssim": v / 100, "ergas": 100.0 - v,
                "bc_psnr": 30.0, "bc_ssim": 0.9}

    orig_log = trainer.logger.print_format_results

    def spy_log(mode, results):
        if mode == "val":
            epochs_seen.append(results["epoch"])
        return orig_log(mode, results)

    monkeypatch.setattr(trainer, "validate", fake_validate)
    monkeypatch.setattr(trainer.logger, "print_format_results", spy_log)
    trainer.train()

    # reference maxima init is 0/0/10000 with an elif chain, so on a
    # monotonically degrading run epoch 0 improves psnr, 1 improves ssim,
    # 2 improves ergas; 3,4 plateau -> rewind to best_epoch(2)+1 = 3
    assert epochs_seen[:6] == [0, 1, 2, 3, 4, 3], epochs_seen
    # after the first plateau the history kept only the best epoch's entry
    # (2 popped of 3); training then stops at the lr floor
    g_lr = get_lr(trainer.state.g_opt)
    d_lr = get_lr(trainer.state.d_opt)
    assert g_lr < 2e-4
    # D halves only for plateaus where the pre-halve lr < 1e-4: the G lr
    # path is 2e-4 -> 1e-4 -> 5e-5 -> ... while D skips the first two.
    assert d_lr > g_lr


def test_epoch_validation_sees_full_sweep_by_default(monkeypatch, tmp_path):
    """The plateau policy must be fed the FULL test sweep (reference
    validates the whole set every epoch, sradsgan.py:979); cfg.val_max_batches
    caps it only when explicitly set."""
    cfg = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg.save_dir = str(tmp_path)
    cfg.num_epochs = 1
    cfg.data.synthetic_size = 8
    trainer = Trainer(cfg)

    seen = []
    orig = trainer.validate

    def spy_validate(max_batches=None):
        seen.append(max_batches)
        return orig(max_batches=max_batches)

    monkeypatch.setattr(trainer, "validate", spy_validate)
    trainer.train()
    assert seen == [None], seen  # full sweep reached the epoch-end call

    cfg2 = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg2.save_dir = str(tmp_path) + "_capped"
    cfg2.num_epochs = 1
    cfg2.data.synthetic_size = 8
    cfg2.val_max_batches = 2
    trainer2 = Trainer(cfg2)
    seen2 = []
    orig2 = trainer2.validate
    monkeypatch.setattr(
        trainer2, "validate",
        lambda max_batches=None: (seen2.append(max_batches),
                                  orig2(max_batches=max_batches))[1])
    trainer2.train()
    assert seen2 == [2], seen2


def test_full_state_checkpoint_with_optimizer(tmp_path):
    cfg = _tiny_cfg("edsr", base_filters=8, num_residuals=1)
    cfg.save_dir = str(tmp_path)
    trainer = Trainer(cfg)
    trainer.train(num_steps=1)
    path = trainer.save_checkpoint(0, include_optimizer=True)
    from sradsgan_tpu.core.checkpoint import restore_pytree
    state = restore_pytree(path)
    assert state.get("g_opt") is not None


def test_relativistic_gan_step():
    """RaGAN option (--relativeGan, reference sradsgan.py:841-848)."""
    cfg = _tiny_cfg("srgan", base_filters=8, num_residuals=1)
    cfg.gan.relativistic = True
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=2)
    assert np.isfinite(out["loss_G"]) and np.isfinite(out["loss_D"])


def test_multi_step_scan_equals_sequential_steps():
    """cfg.steps_per_call: the lax.scan multi-step program produces exactly
    the same state as K sequential single-step dispatches given the same
    batches and rng chain."""
    import jax
    import jax.numpy as jnp
    from sradsgan_tpu.parallel.mesh import shard_batch, shard_stacked_batches

    K = 3
    rng = np.random.default_rng(9)
    batches = [{
        "lr": rng.random((4, 8, 8, 3)).astype(np.float32),
        "hr": rng.random((4, 16, 16, 3)).astype(np.float32),
    } for _ in range(K)]
    keys = jax.random.split(jax.random.PRNGKey(4), K)

    cfg = _tiny_cfg("srgan", base_filters=8, num_residuals=1)
    cfg.data.batch_size = 4

    t1 = Trainer(cfg)
    seq_state = t1.state
    for i in range(K):
        seq_state, seq_metrics = t1._jit_step(
            seq_state, shard_batch(batches[i], t1.mesh), keys[i])

    t2 = Trainer(cfg)
    stacked = shard_stacked_batches(
        {k: np.stack([b[k] for b in batches]) for k in ("lr", "hr")},
        t2.mesh)
    scan_state, scan_metrics = t2._jit_multi_step(t2.state, stacked,
                                                  jnp.asarray(keys))

    # The scan and the K-dispatch path are DIFFERENT compiled programs, so
    # f32 reduction orders differ; Adam amplifies that to +-lr*K on
    # elements whose gradients are ~0 (fresh-init conv biases).  Assert the
    # two-tier invariant (as in test_sharding.py): the overwhelming
    # majority of parameters agree to 1e-6, the degenerate tail is bounded
    # by the accumulated update magnitude.
    lr = cfg.optim.lr
    for seq_p, scan_p in ((seq_state.g_params, scan_state.g_params),
                          (seq_state.d_params, scan_state.d_params)):
        a = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(seq_p)])
        b = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(scan_p)])
        diff = np.abs(a - b)
        # early-Adam per-step updates reach ~2x lr (bias correction)
        assert diff.max() < 2.5 * K * lr, diff.max()
        assert (diff < 1e-6).mean() > 0.98, (diff >= 1e-6).mean()
    assert float(seq_metrics["loss_G"]) == pytest.approx(
        float(scan_metrics["loss_G"][-1]), rel=1e-3, abs=1e-4)


def test_train_loop_with_steps_per_call():
    """The training loop drives correctly with steps_per_call > 1
    (logging cadence snapping, sample-interval eval on the last batch)."""
    cfg = _tiny_cfg("srgan", base_filters=8, num_residuals=1)
    cfg.steps_per_call = 2
    cfg.sample_interval = 2
    trainer = Trainer(cfg)
    out = trainer.train(num_steps=4)
    assert np.isfinite(out["loss_G"]) and np.isfinite(out["loss_D"])


def test_flat_optimizer_matches_per_leaf(monkeypatch):
    """SRADSGAN_TPU_FLAT_OPT (round 4, opt-in — measured net-negative on
    wall time, kept as executable documentation; trainer defaults it to
    '0', docs/PERF.md): raveling params/grads
    into one vector for Adam + the WGAN weight clip is bit-equivalent to
    the per-leaf formulation (Adam and clip are elementwise; the reference
    clips every D param, sradsgan.py:890-892).  The flat path exists
    because the round-4 device trace showed ~8-9 ms/step of per-parameter
    op soup (docs/PERF.md)."""
    import jax
    import jax.numpy as jnp

    def run(flat):
        monkeypatch.setenv("SRADSGAN_TPU_FLAT_OPT", "1" if flat else "0")
        cfg = _tiny_cfg("sradsgan", n_groups=1, n_blocks=1)
        cfg.data.crop_size = 16
        cfg.data.test_crop_size = 16
        trainer = Trainer(cfg)
        rng = np.random.default_rng(0)
        batch = {
            "lr": jnp.asarray(rng.random((8, 8, 8, 3)), jnp.float32),
            "hr": jnp.asarray(rng.random((8, 16, 16, 3)), jnp.float32),
            "bc": jnp.asarray(rng.random((8, 16, 16, 3)), jnp.float32),
        }
        from sradsgan_tpu.parallel.mesh import shard_batch
        batch = shard_batch(batch, trainer.mesh)
        st = trainer.state
        for _ in range(2):
            st, m = trainer._jit_step(st, batch, jax.random.PRNGKey(3))
        return st, m

    s1, m1 = run(True)
    s0, m0 = run(False)
    for a, b in zip(jax.tree.leaves(s1.g_params),
                    jax.tree.leaves(s0.g_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(s1.d_params),
                    jax.tree.leaves(s0.d_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert np.isfinite(float(m1["loss_G"]))
