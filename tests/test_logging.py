"""Logging/observability tests (reference utils/logger.py parity)."""

import glob
import os

import numpy as np

from sradsgan_tpu.utils.logging import Logger, PrintLogger


def test_formatted_logs_and_scalars(tmp_path):
    logger = Logger("test", str(tmp_path))
    logger.print_format_results("train", {"epoch": 0, "loss": 1.5})
    logger.print_format_results("val", {"epoch": 0, "psnr": 30.0})
    assert "loss: 1.5" in open(tmp_path / "loss_log.txt").read()
    assert "psnr: 30.0" in open(tmp_path / "val_log.txt").read()
    logger.scalar_summary("loss", 1.5, 1)


def test_image_and_histogram_summaries(tmp_path):
    """TB image grid + histogram (reference utils/logger.py:64-115)."""
    logger = Logger("test", str(tmp_path))
    rng = np.random.default_rng(0)
    logger.image_summary("sample", [rng.random((8, 8, 3))] * 2, step=1)
    logger.histo_summary("params", rng.normal(size=300_000), step=1)
    if logger.writer is not None:
        logger.writer.flush()
        assert glob.glob(str(tmp_path / "events.out.tfevents*"))


def test_summaries_safe_without_writer(tmp_path):
    logger = Logger("test", str(tmp_path), use_tensorboard=False)
    logger.image_summary("x", [np.zeros((4, 4, 3))], 0)
    logger.histo_summary("y", np.zeros(10), 0)
    logger.scalar_summary("z", 1.0, 0)


def test_print_logger_tee(tmp_path, capsys):
    import sys
    tee = PrintLogger(str(tmp_path))
    old = sys.stdout
    sys.stdout = tee
    try:
        print("hello-tee")
    finally:
        sys.stdout = old
    tee.flush()
    assert "hello-tee" in open(os.path.join(tmp_path, "print_log.txt")).read()
