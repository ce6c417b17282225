"""Device mesh and sharding helpers.

The reference is single-GPU (its ``nn.DataParallel`` branches are dead code,
SURVEY.md §2.7); here data parallelism is first-class: one jitted train step
is pjit-sharded over a 1-D ``data`` mesh, XLA inserting the gradient psum
over ICI.  A second optional ``model`` axis is reserved for spatial/tensor
sharding of large-scene inference.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"

# The most recently created mesh — read by ops/spmd.py at trace time so
# batch-parallel Pallas kernels can shard_map themselves over the data axis
# from deep inside model code (Flax modules have no mesh parameter).
_ACTIVE_MESH: Optional[Mesh] = None


def create_mesh(num_devices: int = -1,
                devices: Optional[list] = None) -> Mesh:
    """1-D data-parallel mesh over local devices."""
    global _ACTIVE_MESH
    devs = devices if devices is not None else jax.devices()
    if num_devices and num_devices > 0:
        devs = devs[:num_devices]
    mesh = Mesh(np.asarray(devs), (DATA_AXIS,))
    _ACTIVE_MESH = mesh
    return mesh


def active_mesh() -> Optional[Mesh]:
    """The last mesh built by :func:`create_mesh` (or None)."""
    return _ACTIVE_MESH


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of host arrays, batch axis split over the mesh.

    Leaves whose leading dimension doesn't divide the mesh (tiny test
    batches, eval tails) are replicated instead — numerically identical,
    just without the parallel speedup.
    """
    split = batch_sharding(mesh)
    repl = replicated(mesh)
    n = mesh.devices.size

    def put(x):
        ok = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
        return jax.device_put(x, split if ok else repl)

    return jax.tree.map(put, batch)


def shard_stacked_batches(batches: Any, mesh: Mesh) -> Any:
    """Device-put a pytree of (K, B, ...) host arrays — K stacked train
    batches for a multi-step ``lax.scan`` — with the BATCH axis (dim 1)
    split over the mesh and the scan axis replicated."""
    split = NamedSharding(mesh, P(None, DATA_AXIS))
    repl = replicated(mesh)
    n = mesh.devices.size

    def put(x):
        ok = getattr(x, "ndim", 0) >= 2 and x.shape[1] % n == 0
        return jax.device_put(x, split if ok else repl)

    return jax.tree.map(put, batches)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_batch_to_devices(batch: Any, mesh: Mesh) -> Any:
    """Pad the leading axis so it divides the mesh size (eval tail batches)."""
    n = mesh.devices.size

    def _pad(x):
        rem = x.shape[0] % n
        if rem == 0:
            return x
        pad = [(0, n - rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, pad, mode="edge")

    return jax.tree.map(_pad, batch)
