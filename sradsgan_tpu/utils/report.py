"""Model cost reporting + profiling.

Parity with the reference's thop-based ``print_network_to_file``
(utils/utils.py:971-1008, written to ``network.txt`` at train/eval start,
sradsgan.py:678-680) — here param counts come from the pytree and FLOPs from
XLA's own compiled cost analysis, which reflects what actually runs on the
TPU after fusion.  ``trace`` wraps ``jax.profiler`` for on-demand device
traces (the reference has no tracer; SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any, Optional

import numpy as np

import jax


def count_params(params: Any) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def flops_estimate(fn, *args) -> Optional[float]:
    """FLOPs of the jitted fn from XLA cost analysis (None if unavailable)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", float("nan")))
    except Exception:
        return None


def print_network_to_file(model, variables, example_input, save_dir: str,
                          tag: str) -> str:
    """Write a network.txt-style report: params, FLOPs, module repr."""
    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "network.txt")
    n_params = count_params(variables.get("params", variables))
    flops = flops_estimate(
        lambda v, x: model.apply(v, x, train=False), variables,
        example_input)
    with open(path, "a") as f:
        f.write(f"=== {tag} ===\n")
        f.write(f"params: {n_params} ({n_params / 1e6:.3f} M)\n")
        if flops is not None:
            f.write(f"flops (XLA, batch {example_input.shape[0]}): "
                    f"{flops:.3e} ({flops / 1e9:.3f} G)\n")
        f.write(str(model) + "\n\n")
    return path


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
