"""Optional Weights & Biases logging shim.

Reference: GDP_x0/core/wandb_logger.py (116 LoC) — metrics/images/checkpoint
logging when wandb is configured.  wandb is not bundled in this image; the
shim no-ops cleanly when the import fails so callers can log
unconditionally.
"""

from __future__ import annotations

from typing import Any, Dict, Optional


class WandbLogger:
    def __init__(self, project: str = "sradsgan_tpu",
                 config: Optional[Dict[str, Any]] = None, **kwargs):
        try:
            import wandb
            self._run = wandb.init(project=project, config=config, **kwargs)
            self._wandb = wandb
        except Exception:
            self._run = None
            self._wandb = None

    @property
    def enabled(self) -> bool:
        return self._run is not None

    def log_metrics(self, metrics: Dict[str, float],
                    step: Optional[int] = None) -> None:
        if self._run is not None:
            self._run.log(metrics, step=step)

    def log_image(self, key: str, image, step: Optional[int] = None) -> None:
        if self._run is not None:
            self._run.log({key: self._wandb.Image(image)}, step=step)

    def log_checkpoint(self, path: str) -> None:
        if self._run is not None:
            self._run.save(path)

    def finish(self) -> None:
        if self._run is not None:
            self._run.finish()
