"""Training/eval logging: formatted text logs, stdout tee, TensorBoard.

Reproduces the reference's three sinks (utils/logger.py):
- ``loss_log.txt`` / ``val_log.txt`` formatted lines (:117-147);
- ``print_log.txt`` stdout tee (PrintLogger, :17-27);
- scalar summaries (TF1 FileWriter there; tensorboardX here, optional).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Dict


class PrintLogger:
    """Tee stdout to ``print_log.txt`` (reference utils/logger.py:17-27)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.terminal = sys.stdout
        self.log = open(os.path.join(log_dir, "print_log.txt"), "a")

    def write(self, message: str) -> None:
        self.terminal.write(message)
        self.log.write(message)

    def flush(self) -> None:
        self.terminal.flush()
        self.log.flush()


class Logger:
    """Formatted train/val logs + optional tensorboardX scalars."""

    def __init__(self, model_name: str, log_dir: str,
                 use_tensorboard: bool = True):
        self.model_name = model_name
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.loss_log = os.path.join(log_dir, "loss_log.txt")
        self.val_log = os.path.join(log_dir, "val_log.txt")
        self.writer = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self.writer = SummaryWriter(log_dir)
            except Exception:
                self.writer = None

    def scalar_summary(self, tag: str, value: float, step: int) -> None:
        if self.writer is not None:
            self.writer.add_scalar(tag, value, step)

    def image_summary(self, tag: str, images01, step: int) -> None:
        """TensorBoard image grid (reference utils/logger.py:64-87).

        ``images01``: iterable of HWC float arrays in [0, 1].
        """
        if self.writer is None:
            return
        import numpy as np
        for i, img in enumerate(images01):
            arr = (np.clip(np.asarray(img, np.float32), 0, 1)
                   * 255).astype(np.uint8)
            self.writer.add_image(f"{tag}/{i}", arr.transpose(2, 0, 1), step)

    def histo_summary(self, tag: str, values, step: int,
                      max_values: int = 100_000) -> None:
        """TensorBoard histogram (reference utils/logger.py:89-115);
        large value sets are subsampled to bound the event-file size."""
        if self.writer is None:
            return
        import numpy as np
        vals = np.asarray(values).ravel()
        if vals.size > max_values:
            vals = vals[:: vals.size // max_values + 1]
        self.writer.add_histogram(tag, vals, step)

    def print_format_results(self, mode: str,
                             results: Dict[str, object]) -> None:
        """One formatted line per event (reference utils/logger.py:117-147)."""
        parts = [f"{k}: {v:.6f}" if isinstance(v, float) else f"{k}: {v}"
                 for k, v in results.items()]
        line = f"{time.strftime('%y-%m-%d %H:%M:%S')} [{self.model_name}] " \
               + " ".join(parts)
        path = self.val_log if mode == "val" else self.loss_log
        with open(path, "a") as f:
            f.write(line + "\n")
        print(line)
