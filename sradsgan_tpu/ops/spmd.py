"""shard_map plumbing that keeps Pallas kernels live on multi-chip meshes.

A ``pallas_call`` inside a pjit'd program is opaque to XLA's SPMD
partitioner, so round 3 gated every Pallas fast path (flash SGAM, fused
pool, SLAM kernels) to single-device meshes — a real v5e-8 run would
silently lose the optimizations that set the single-chip headline
(docs/PERF.md "Known headroom").  All of these kernels are batch-parallel
(grid over the batch dim, no cross-batch reduction), so the natural SPMD
form is a ``jax.shard_map`` over the data axis: each device runs the
unchanged kernel on its local batch shard, bit-identical to the
single-device result gathered.

``plan_batch_kernel(batch)`` is the trace-time decision:

- ``"direct"``   — one device; call the kernel as before;
- a ``Mesh``     — multi-device AND the active data mesh covers every
                   device AND the global batch divides it; wrap with
                   :func:`shard_map_batch`;
- ``None``       — multi-device but no compatible mesh (or indivisible
                   batch); the caller must use its jnp formulation, which
                   the SPMD partitioner splits like any other op.

The mesh comes from :func:`sradsgan_tpu.parallel.mesh.active_mesh` — the
last mesh built by ``create_mesh`` (the trainer's, in every entry point).
The guard ``mesh.devices.size == jax.device_count()`` rejects stale or
partial meshes: a kernel sharded over a 2-device mesh while the enclosing
jit runs on 8 would deadlock in the collective-free case or misplace
shards.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Union

import jax
from jax.sharding import Mesh, PartitionSpec as P

DIRECT = "direct"


def pallas_interpret() -> bool:
    """SRADSGAN_TPU_PALLAS_INTERPRET=1 runs the Pallas kernels in
    interpreter mode on any backend — the only way to exercise the
    multi-device shard_map wrap on the CPU test mesh (real multi-chip TPU
    hardware is unavailable in this environment)."""
    import os
    return os.environ.get("SRADSGAN_TPU_PALLAS_INTERPRET", "") == "1"


def plan_batch_kernel(batch: int) -> Union[str, Mesh, None]:
    """Decide how to run a batch-parallel Pallas kernel (see module doc)."""
    try:
        n = jax.device_count()
    except Exception:
        return None
    if n == 1:
        return DIRECT
    from sradsgan_tpu.parallel.mesh import active_mesh
    mesh = active_mesh()
    if mesh is None or mesh.devices.size != n:
        return None
    if batch % n != 0:
        return None
    return mesh


def per_device_batch(batch: int) -> int:
    """The batch each device executes under the current plan (== ``batch``
    on a single device)."""
    plan = plan_batch_kernel(batch)
    if isinstance(plan, Mesh):
        return batch // plan.devices.size
    return batch


def shard_map_batch(fn: Callable, mesh: Mesh, n_batched_in: int,
                    n_rep_in: int = 0,
                    out_batched: Union[bool, Sequence[bool]] = True
                    ) -> Callable:
    """Wrap ``fn`` in ``jax.shard_map`` over the mesh's first axis.

    The first ``n_batched_in`` positional args are split on dim 0; the next
    ``n_rep_in`` are replicated (kernel weights).  ``out_batched`` mirrors
    the output structure (True = split on dim 0).  ``check_vma=False``
    because Pallas calls don't carry varying-manual-axes info.
    """
    axis = mesh.axis_names[0]
    in_specs = tuple([P(axis)] * n_batched_in + [P()] * n_rep_in)
    if isinstance(out_batched, bool):
        out_specs: Any = P(axis) if out_batched else P()
    else:
        out_specs = tuple(P(axis) if b else P() for b in out_batched)
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
