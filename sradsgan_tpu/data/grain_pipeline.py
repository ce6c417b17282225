"""Optional Grain-based input pipeline (multiprocess decode).

The default loader (data/loader.py) is a thread pool — plenty for 216²
crops, but PIL decode holds chunks of the GIL.  For large production
corpora this module builds the same LR/HR/bicubic triplet stream with
Grain's multiprocess data loading (SURVEY.md §7's "tf.data/Grain" feed).

Per-host sharding: on a multi-host slice pass ``shard_index/shard_count``
(e.g. ``jax.process_index()/jax.process_count()``) so each host decodes
only its share — the mesh's data-parallel axis then consumes disjoint
streams.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def make_grain_loader(dataset, batch_size: int, *, shuffle: bool = True,
                      seed: int = 0, num_workers: int = 0,
                      num_epochs: Optional[int] = 1,
                      shard_index: int = 0, shard_count: int = 1,
                      drop_remainder: bool = True):
    """Returns a Grain DataLoader yielding collated numpy triplet batches.

    ``num_workers > 0`` enables multiprocess decode on a normal TPU VM.
    (In this build container the axon sitecustomize crashes Grain worker
    subprocesses, so the default is in-process; the threaded
    data/loader.py remains the default pipeline either way.)
    """
    import grain.python as grain

    class TripletMap(grain.MapTransform):
        def map(self, index: int) -> Dict[str, Any]:
            out = dataset.load(int(index),
                               np.random.default_rng(int(index)))
            out.pop("path", None)
            return out

    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=grain.ShardOptions(shard_index=shard_index,
                                         shard_count=shard_count,
                                         drop_remainder=drop_remainder),
    )
    operations = [
        TripletMap(),
        grain.Batch(batch_size=batch_size, drop_remainder=drop_remainder),
    ]
    return grain.DataLoader(
        data_source=np.arange(len(dataset)),
        sampler=sampler,
        operations=operations,
        worker_count=num_workers,
    )
