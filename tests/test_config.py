"""Config system tests."""

import numpy as np

from sradsgan_tpu.core.config import (config_for_model, load_config,
                                      save_config, TrainConfig)


def test_per_model_defaults():
    cfg = config_for_model("edsr", 2)
    assert cfg.optim.lr == 1e-4 and cfg.num_epochs == 3
    cfg = config_for_model("ndsrgan", 4)
    assert cfg.optim.step_decay_epochs == 12 and cfg.num_epochs == 47
    cfg = config_for_model("sradsgan", 8)
    assert cfg.gan.gan_type == "wgan-gp"
    assert cfg.gan.weight_content == 1e-2 and cfg.gan.weight_gan == 1e-3


def test_dotted_overrides():
    cfg = config_for_model("srgan", 4, **{"optim.lr": 5e-5,
                                          "data.batch_size": 4,
                                          "gan.lambda_gp": 5.0})
    assert cfg.optim.lr == 5e-5
    assert cfg.data.batch_size == 4
    assert cfg.gan.lambda_gp == 5.0


def test_config_json_roundtrip(tmp_path):
    cfg = config_for_model("sradsgan", 4)
    cfg.data.synthetic = True
    path = str(tmp_path / "cfg.json")
    save_config(cfg, path)
    # add a GDP-style comment line to exercise the tolerant parser
    text = open(path).read().replace('"scale": 4,',
                                     '"scale": 4, // the scale')
    open(path, "w").write(text)
    loaded = load_config(path)
    assert loaded.scale == 4
    assert loaded.model == "sradsgan"
    assert loaded.data.synthetic is True
    assert loaded.gan.gan_type == "wgan-gp"


def test_unknown_override_raises():
    import pytest
    with pytest.raises(AttributeError):
        config_for_model("edsr", 2, **{"optim.nonexistent": 1})
