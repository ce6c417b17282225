"""Production inference: shape-bucketed predictor + AOT model export.

The reference has no serving story (research scripts only); this module is
the deployment surface of the TPU build:

- :class:`Predictor` — params baked in, per-shape compiled executables with
  LR inputs bucketed to a fixed shape set (no recompiles in steady state),
  optional bf16 activations, automatic halo-tiled fallback for inputs larger
  than the biggest bucket;
- :func:`export_model` / :func:`load_exported` — serialize the jitted
  forward as a StableHLO artifact via ``jax.export`` so a separate serving
  binary can run it without the Python model code.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import export as jax_export


class Predictor:
    """Batched SR inference with a fixed compile-shape bucket set."""

    def __init__(self, generator, variables, scale: int,
                 buckets: Sequence[int] = (54, 72, 108, 216),
                 tile: int = 54, halo: int = 8):
        self.generator = generator
        self.variables = variables
        self.scale = scale
        self.buckets = sorted(buckets)
        self.tile = tile
        self.halo = halo
        # ONE jit'd callable: jax.jit specializes (and caches) per input
        # shape internally, so bucketing only controls WHICH shapes occur —
        # a per-bucket dict of identical jit objects would be dead
        # structure (round-2 advisor finding).
        self._fn = jax.jit(
            lambda v, x: self.generator.apply(v, x, train=False))

    def __call__(self, lr01: np.ndarray) -> np.ndarray:
        """(B, H, W, C) or (H, W, C) float [0,1] -> SR, any input size.

        Square inputs that fit a bucket are padded up to it (reflect) and
        cropped back; larger inputs go through halo-tiled inference.
        """
        squeeze = lr01.ndim == 3
        if squeeze:
            lr01 = lr01[None]
        b, h, w, c = lr01.shape
        size = max(h, w)
        bucket = next((s for s in self.buckets if s >= size), None)
        if bucket is None:
            from sradsgan_tpu.evaluation.tiled import tiled_super_resolve
            out = np.stack([
                tiled_super_resolve(self.generator, self.variables,
                                    lr01[i], self.scale, self.tile,
                                    self.halo) for i in range(b)])
        else:
            padded = np.pad(lr01, ((0, 0), (0, bucket - h), (0, bucket - w),
                                   (0, 0)), mode="reflect")
            out = np.asarray(self._fn(
                self.variables, jnp.asarray(padded)).astype(jnp.float32))
            out = out[:, :h * self.scale, :w * self.scale]
        return out[0] if squeeze else out


def export_model(generator, variables, lr_size: int, out_path: str,
                 batch: int = 1, channels: int = 3) -> str:
    """Serialize the jitted forward as a StableHLO artifact.

    The artifact embeds the weights (closure capture) — a serving binary
    deserializes and calls it with just the LR batch.
    """
    x_spec = jax.ShapeDtypeStruct((batch, lr_size, lr_size, channels),
                                  jnp.float32)

    def forward(x):
        return generator.apply(variables, x, train=False)

    exported = jax_export.export(jax.jit(forward))(x_spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(data)
    return out_path


def load_exported(path: str):
    """Deserialize an exported model; returns a callable over LR batches."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return lambda x: exported.call(jnp.asarray(x, jnp.float32))
