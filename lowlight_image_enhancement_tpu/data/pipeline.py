"""Batching / shuffling / prefetch input pipeline (host-side, per-host sharded).

Replaces the reference's torch DataLoader + EnlargedSampler + prefetchers
(``basicsr/data/__init__.py:38-138``, ``data_sampler.py``,
``prefetch_dataloader.py``):

- :class:`Loader` — epoch-seeded shuffling (the EnlargedSampler semantics:
  dataset-enlarging ratio, deterministic per-epoch permutation), drop-last
  batching, per-host sharding for multi-host training (each host yields the
  ``host_id``-strided subset — replacing rank-strided sampling),
- :func:`prefetch_to_device` — a double-buffered device prefetcher
  (replacing ``CUDAPrefetcher``'s side-stream H2D copies with async
  ``jax.device_put`` one batch ahead).
"""

from __future__ import annotations

import collections
import itertools
from typing import Any, Dict, Iterator, Mapping, Optional

import jax
import numpy as np


def _stack_batch(items) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key in items[0]:
        vals = [it[key] for it in items]
        if isinstance(vals[0], (np.ndarray, np.floating, float, int)):
            out[key] = np.stack([np.asarray(v) for v in vals])
        else:
            out[key] = vals  # strings (pair_id, key)
    return out


class Loader:
    """Deterministic shuffling batcher over a map-style dataset.

    Args:
      dataset: object with ``__len__``/``__getitem__`` -> dict.
      batch_size: **global** batch size; with ``num_hosts > 1`` each host
        yields ``batch_size // num_hosts`` items of its strided shard.
      shuffle: epoch-seeded permutation (seed + epoch), reference
        ``EnlargedSampler`` semantics.
      enlarge_ratio: virtual dataset enlargement (modulo indexing).
      drop_last: drop the trailing partial batch (train default).
      num_workers: >0 enables thread-pool item fetching (decode hot paths
        release the GIL via ctypes/cv2, so threads scale ~linearly on
        multi-core hosts; on a single-core host keep 0 — threads only add
        contention).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        enlarge_ratio: int = 1,
        drop_last: bool = True,
        num_hosts: int = 1,
        host_id: int = 0,
        num_workers: int = 0,
    ):
        if batch_size % num_hosts != 0:
            raise ValueError("batch_size must divide evenly across hosts")
        self.dataset = dataset
        self.batch_size = batch_size
        self.local_batch = batch_size // num_hosts
        self.shuffle = shuffle
        self.seed = seed
        self.enlarge_ratio = max(int(enlarge_ratio), 1)
        self.drop_last = drop_last
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.num_workers = int(num_workers)
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) * self.enlarge_ratio
        per_host = n // self.num_hosts
        if self.drop_last:
            return per_host // self.local_batch
        return -(-per_host // self.local_batch)

    def _order(self) -> np.ndarray:
        n = len(self.dataset) * self.enlarge_ratio
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        return order[self.host_id :: self.num_hosts]

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        order = self._order()
        if self.num_workers > 0:
            yield from self._iter_threaded(order)
            return
        batch = []
        for virtual_idx in order:
            batch.append(self.dataset[int(virtual_idx) % len(self.dataset)])
            if len(batch) == self.local_batch:
                yield _stack_batch(batch)
                batch = []
        if batch and not self.drop_last:
            yield _stack_batch(batch)

    def _iter_threaded(self, order: np.ndarray
                       ) -> Iterator[Dict[str, Any]]:
        """Thread-pool item fetching with a bounded lookahead window.

        The decode hot path (zlib inflate + crop in ``native/sidpack.cpp``
        via ctypes, or cv2 PNG decode) releases the GIL, so threads give
        near-linear host-loading speedup. Order and determinism are
        preserved: items are submitted and consumed in sequence.
        """
        import concurrent.futures as cf

        lookahead = self.local_batch * max(self.num_workers, 1) * 2
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            futures = []
            it = iter(order)

            def submit_next():
                try:
                    virtual_idx = next(it)
                except StopIteration:
                    return False
                futures.append(pool.submit(
                    self.dataset.__getitem__,
                    int(virtual_idx) % len(self.dataset),
                ))
                return True

            for _ in range(lookahead):
                if not submit_next():
                    break
            batch = []
            while futures:
                batch.append(futures.pop(0).result())
                submit_next()
                if len(batch) == self.local_batch:
                    yield _stack_batch(batch)
                    batch = []
            if batch and not self.drop_last:
                yield _stack_batch(batch)


def epochs(loader: Loader, num_epochs: Optional[int] = None,
           start_epoch: int = 0) -> Iterator[Dict[str, Any]]:
    """Flatten epochs into a single batch stream, calling ``set_epoch``.

    ``start_epoch`` resumes the deterministic shuffle sequence mid-run
    (the trainer passes ``resume_iter // len(loader)``)."""
    counter = (range(start_epoch, start_epoch + num_epochs) if num_epochs
               else itertools.count(start_epoch))
    for ep in counter:
        loader.set_epoch(ep)
        yield from loader


def prefetch_to_device(
    batches: Iterator[Mapping[str, Any]],
    size: int = 2,
    sharding=None,
    drop_keys=("pair_id", "key"),
) -> Iterator[Dict[str, Any]]:
    """Double-buffered async host->device transfer.

    Starts ``size`` transfers ahead (``jax.device_put`` is async); numeric
    entries move to device (optionally with a NamedSharding), string
    metadata keys are dropped (device arrays can't hold them).
    """
    queue: collections.deque = collections.deque()

    def put(batch):
        numeric = {k: v for k, v in batch.items() if k not in drop_keys}
        if sharding is not None:
            from lowlight_image_enhancement_tpu.parallel.mesh import (
                shard_batch,
            )

            return shard_batch(numeric, sharding.mesh)
        return {k: jax.device_put(np.asarray(v)) for k, v in numeric.items()}

    for batch in batches:
        queue.append(put(batch))
        if len(queue) > size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
