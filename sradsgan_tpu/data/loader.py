"""Batching + background prefetch + device sharding.

Replaces the reference's ``DataLoader(num_workers=16, pin_memory)`` +
synchronous ``input_lr.copy_(input)`` H2D copies (sradsgan.py:643-656,
:821-823) — and its *unused* CUDA-stream DataPrefetcher (data/dataset.py:
55-86) — with a thread-pool loader that decodes/degrades on host while the
TPU computes, and double-buffers ``jax.device_put`` transfers with the batch
pre-sharded over the data mesh.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator

import numpy as np

from sradsgan_tpu.parallel.mesh import shard_batch, shard_stacked_batches


def _collate(samples) -> Dict[str, np.ndarray]:
    batch = {k: np.stack([s[k] for s in samples]) for k in ("lr", "hr", "bc")}
    batch["path"] = [s["path"] for s in samples]
    return batch


class DataLoader:
    """Epoch iterator over a dataset yielding collated numpy batches."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 drop_last: bool = True, num_workers: int = 8,
                 seed: int = 0, augment_rng: bool = False,
                 shard_index: int = 0, shard_count: int = 1):
        """``shard_index``/``shard_count``: per-host input sharding for
        multi-host meshes — every host shuffles with the SAME seed and takes
        a disjoint stride of the order (defaults give the single-host
        behavior; mirrors grain_pipeline's shard options)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.seed = seed
        self.augment_rng = augment_rng
        self.shard_index = shard_index
        self.shard_count = max(shard_count, 1)
        self._epoch = 0

    def _shard_len(self) -> int:
        n = len(self.dataset)
        return (n - self.shard_index + self.shard_count - 1) \
            // self.shard_count

    def __len__(self) -> int:
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(len(self.dataset))
        rng = np.random.default_rng(self.seed + self._epoch)
        if self.shuffle:
            rng.shuffle(order)
        if self.shard_count > 1:
            order = order[self.shard_index::self.shard_count]
        n = len(order)
        self._epoch += 1

        stop = n - (n % self.batch_size) if self.drop_last else n
        indices = [order[i:i + self.batch_size]
                   for i in range(0, stop, self.batch_size)]
        if not indices:
            return

        def load_one(idx):
            r = (np.random.default_rng(self.seed * 100003 + int(idx))
                 if self.augment_rng else None)
            return self.dataset.load(int(idx), r)

        with ThreadPoolExecutor(self.num_workers) as pool:
            # Pipeline: submit batch i+1 while yielding batch i.
            pending = pool.map(load_one, indices[0])
            for nxt in indices[1:]:
                samples = list(pending)
                pending = pool.map(load_one, nxt)
                yield _collate(samples)
            yield _collate(list(pending))


def device_prefetch_stacked(iterator, mesh, k: int, depth: int = 2,
                            keys=("lr", "hr")):
    """Buffer ``k`` host batches, stack them into (K, B, ...) arrays, and
    move them to device ahead of consumption — feed for the trainer's
    multi-step ``lax.scan`` (one dispatch per K steps instead of per step).

    Yields ``(stacked_device_tree, last_host_batch)``; the last raw batch
    is kept host-side for sample-interval eval.  A trailing partial chunk
    (< k batches) is dropped, like ``drop_last`` — a smaller K would force
    a fresh XLA compile.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        # A producer failure must surface in the consumer, not vanish as a
        # silently short epoch: the sentinel carries the exception (if any)
        # and the consumer re-raises it after draining.
        err = None
        try:
            buf = []
            for batch in iterator:
                batch.pop("path", None)
                buf.append(batch)
                if len(buf) == k:
                    stacked = {key: np.stack([b[key] for b in buf])
                               for key in keys}
                    q.put((shard_stacked_batches(stacked, mesh), buf[-1]))
                    buf = []
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            err = e
        q.put(_Sentinel(err))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, _Sentinel):
            if item.err is not None:
                raise item.err
            break
        yield item


class _Sentinel:
    """End-of-stream marker; carries a producer exception to re-raise."""

    def __init__(self, err=None):
        self.err = err


def device_prefetch(iterator, mesh, depth: int = 2):
    """Move batches to device ahead of consumption (double buffering)."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def producer():
        err = None
        try:
            for batch in iterator:
                paths = batch.pop("path", None)
                sharded = shard_batch(batch, mesh)
                if paths is not None:
                    sharded["path"] = paths
                q.put(sharded)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            err = e
        q.put(_Sentinel(err))

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if isinstance(item, _Sentinel):
            if item.err is not None:
                raise item.err
            break
        yield item
