"""In-process CLI tests on the virtual CPU mesh."""

import json
import os

import numpy as np
import pytest

from sradsgan_tpu.cli import main


def test_list_models(capsys):
    assert main(["list-models"]) == 0
    out = capsys.readouterr().out
    assert "sradsgan" in out and "wgan-gp" in out and "hat" in out


def test_cli_train_smoke(tmp_path, capsys):
    rc = main(["train", "--model", "edsr", "--scale", "2",
               "--data", "synthetic", "--crop-size", "32",
               "--batch-size", "4", "--steps", "2", "--no-bf16",
               "--save-dir", str(tmp_path), "--no-final-eval",
               "--model-kwargs", '{"base_filters": 8, "num_residuals": 1}'])
    assert rc == 0
    out = capsys.readouterr().out
    assert "loss_G" in out


def test_cli_chain_train(tmp_path, capsys):
    rc = main(["chain-train", "--model", "edsr", "--scales", "2", "3",
               "--data", "synthetic", "--crop-size", "36",
               "--batch-size", "4", "--steps", "1", "--no-bf16",
               "--save-dir", str(tmp_path),
               "--model-kwargs", '{"base_filters": 8, "num_residuals": 1}'])
    assert rc == 0
    out = capsys.readouterr().out
    assert "x2" in out and "x3" in out
    # the x3 run warm-started from the x2 checkpoint
    assert "init_from" in out


def test_cli_infer(tmp_path, capsys):
    from PIL import Image
    img = str(tmp_path / "in.png")
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (24, 24, 3), dtype=np.uint8)).save(img)
    rc = main(["infer", "--model", "edsr", "--scale", "2", "--image", img,
               "--out-dir", str(tmp_path / "out"),
               "--model-kwargs", '{"base_filters": 8, "num_residuals": 1}'])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(result["sr"])


def test_cli_diffusion_validate(tmp_path, capsys):
    """The reference's ``sr_mfe.py -p val`` surface: metric suite + dumps."""
    rdir = str(tmp_path / "val")
    rc = main(["diffusion-validate", "--scale", "2",
               "--data", "synthetic", "--crop-size", "16",
               "--batch-size", "2", "--timesteps", "4", "--no-bf16",
               "--save-dir", str(tmp_path),
               "--unet-kwargs",
               '{"inner_channel": 32, "channel_mults": [1, 2],'
               ' "res_blocks": 1}',
               "--max-images", "1", "--result-dir", rdir, "--continuous"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert np.isfinite(result["psnr"])
    files = os.listdir(rdir)
    assert any(f.endswith("_sr_process.png") for f in files), files
    assert any(f.endswith("_plot.png") for f in files), files


def test_cli_train_archives_stale_run_dir(tmp_path, capsys):
    """A fresh (non-resume) train run renames an existing run dir to
    *_archived_<timestamp> instead of mixing outputs into it — the
    reference's check_args -> mkdir_and_rename behavior
    (main_sradsgan.py:66-86, utils/utils.py:830-838)."""
    stale = tmp_path / "EDSR_x2"
    stale.mkdir()
    (stale / "old_output.txt").write_text("stale")
    rc = main(["train", "--model", "edsr", "--scale", "2",
               "--data", "synthetic", "--crop-size", "32",
               "--batch-size", "4", "--steps", "1", "--no-bf16",
               "--save-dir", str(tmp_path), "--no-final-eval",
               "--model-kwargs", '{"base_filters": 8, "num_residuals": 1}'])
    assert rc == 0
    archived = [p for p in tmp_path.iterdir()
                if p.name.startswith("EDSR_x2_archived_")]
    assert len(archived) == 1
    assert (archived[0] / "old_output.txt").read_text() == "stale"
    assert (tmp_path / "EDSR_x2").is_dir()  # fresh dir created by the run
