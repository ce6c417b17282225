"""Checkpointing via Orbax, with the reference's chain-training semantics.

The reference saves per-epoch ``{generator,discriminator}_param_epoch_N.pkl``
torch pickles plus a final ``generator_param.pkl`` (model/sradsgan.py:
1197-1227) and warm-starts the next scale with ``strict=False`` so the
scale-specific upsample tail re-initializes (sradsgan.py:716-721).  Here:

- Orbax PyTree checkpoints of the full train state (params, batch stats,
  optimizer state, step);
- ``partial_restore`` merges a source params tree into a freshly initialized
  target, keeping only leaves whose path+shape match — the ``strict=False``
  analog used for x2 -> x3 -> x4 -> x8 -> x9 chain training.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)


def restore_pytree(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    if target is not None:
        return ckptr.restore(path, args=ocp.args.PyTreeRestore(
            jax.tree.map(np.asarray, target)))
    return ckptr.restore(path)


def partial_restore(target: Any, source: Any) -> Any:
    """Merge source leaves into target where path and shape match.

    The JAX analog of ``load_state_dict(strict=False)`` with shape checking:
    chain training restores everything except the upsample tail whose conv
    widths differ between scale families (2^n: C*4 vs 3^n: C*9).
    """
    flat_t = jax.tree_util.tree_flatten_with_path(target)[0]
    flat_s = dict(jax.tree_util.tree_flatten_with_path(source)[0])
    merged = {}
    kept = skipped = 0
    for path, leaf in flat_t:
        src = flat_s.get(path)
        if src is not None and getattr(src, "shape", None) == leaf.shape:
            merged[path] = src
            kept += 1
        else:
            merged[path] = leaf
            skipped += 1
    treedef = jax.tree_util.tree_structure(target)
    ordered = [merged[p] for p, _ in flat_t]
    out = jax.tree_util.tree_unflatten(treedef, ordered)
    return out, kept, skipped
