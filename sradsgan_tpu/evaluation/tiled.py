"""Halo-tiled large-scene SR inference, data-parallel over the device mesh.

The reference can only center-crop a large GeoTIFF to one training-size tile
(mfe_test_single, model/sradsgan.py:1621-1629).  This module super-resolves
arbitrarily large scenes: the image is cut into overlapping tiles (halo
padding absorbs conv receptive-field edge effects), the tile batch is
sharded over the data mesh (each chip SRs its share in one jitted call), and
the upscaled cores are stitched back.  SURVEY.md §2.7's "spatial-shard large
GeoTIFF inference" stretch goal.
"""

from __future__ import annotations

import math
import numpy as np

import jax
import jax.numpy as jnp

from sradsgan_tpu.parallel.mesh import create_mesh, shard_batch


def tiled_super_resolve(generator, variables, image01: np.ndarray,
                        scale: int, tile: int = 54, halo: int = 8,
                        mesh=None, batch_tiles: int = 64) -> np.ndarray:
    """SR a (H, W, C) float [0,1] image of any size.

    tile/halo are in LR pixels; each device call processes up to
    ``batch_tiles`` tiles of (tile + 2*halo)^2.
    """
    mesh = mesh or create_mesh()
    h, w, c = image01.shape
    ny = math.ceil(h / tile)
    nx = math.ceil(w / tile)
    pad_h = ny * tile - h
    pad_w = nx * tile - w
    padded = np.pad(image01, ((halo, halo + pad_h), (halo, halo + pad_w),
                              (0, 0)), mode="reflect")

    tiles = []
    for iy in range(ny):
        for ix in range(nx):
            y0, x0 = iy * tile, ix * tile
            tiles.append(padded[y0:y0 + tile + 2 * halo,
                                x0:x0 + tile + 2 * halo])
    tiles = np.stack(tiles).astype(np.float32)

    fwd = jax.jit(lambda v, x: generator.apply(v, x, train=False))
    n_dev = mesh.devices.size
    chunk = max(batch_tiles - batch_tiles % n_dev, n_dev)

    outs = []
    for i in range(0, len(tiles), chunk):
        part = tiles[i:i + chunk]
        n_pad = (-len(part)) % n_dev
        if n_pad:
            part = np.concatenate([part, np.repeat(part[-1:], n_pad, 0)])
        sharded = shard_batch({"x": part}, mesh)["x"]
        out = np.asarray(fwd(variables, sharded).astype(jnp.float32))
        outs.append(out[:len(out) - n_pad] if n_pad else out)
    sr_tiles = np.concatenate(outs)

    hs = halo * scale
    ts = tile * scale
    result = np.zeros((ny * ts, nx * ts, c), np.float32)
    k = 0
    for iy in range(ny):
        for ix in range(nx):
            core = sr_tiles[k, hs:hs + ts, hs:hs + ts]
            result[iy * ts:(iy + 1) * ts, ix * ts:(ix + 1) * ts] = core
            k += 1
    return result[:h * scale, :w * scale]
