"""Persistent XLA compilation cache setup.

Full-size train-step compiles take minutes through this environment's
remote-compile relay; the persistent cache makes every process after the
first start instantly.  Called from the CLI, bench, and Trainer; opt out
with SRADSGAN_TPU_NO_COMPILE_CACHE=1 or point elsewhere with
SRADSGAN_TPU_COMPILE_CACHE=<dir>.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.expanduser("~/.cache/sradsgan_tpu/xla")
_done = False


def enable_compilation_cache() -> None:
    global _done
    if _done or os.environ.get("SRADSGAN_TPU_NO_COMPILE_CACHE") == "1":
        return
    _done = True
    try:
        import jax
        cache_dir = os.environ.get("SRADSGAN_TPU_COMPILE_CACHE",
                                   _DEFAULT_DIR)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
