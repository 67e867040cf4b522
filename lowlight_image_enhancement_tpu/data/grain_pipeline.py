"""Optional Grain-based input pipeline (multi-worker host loading).

The framework's default :class:`..data.pipeline.Loader` is a simple
deterministic in-process batcher. For production input pressure (large
crops, many chips) this module adapts any map-style dataset (e.g.
:class:`..data.sid_dataset.SonySIDDataset`) to `grain` — the JAX-ecosystem
data loader — gaining multi-process workers, prefetch, and checkpointable
iteration, while keeping the same batch-dict contract.

Gated import: everything here raises a clear error if grain is missing.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional

import numpy as np


def _require_grain():
    try:
        import grain.python as grain
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "grain is required for the grain pipeline; use "
            "data.pipeline.Loader otherwise"
        ) from e
    return grain


class _Source:
    """grain RandomAccessDataSource over a map-style dataset."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self) -> int:
        return len(self._dataset)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        item = dict(self._dataset[int(idx)])
        # strings can't cross worker boundaries as arrays; keep them —
        # grain handles arbitrary pytrees — but drop nothing here.
        return item


class _StackBatch:
    """Batch transformation stacking numeric entries (grain MapTransform
    over already-batched lists is handled by grain's Batch op; this just
    ensures contiguity/dtypes)."""

    def __call__(self, batch: Mapping[str, Any]) -> Dict[str, Any]:
        out = {}
        for k, v in batch.items():
            if isinstance(v, np.ndarray) and v.dtype != object:
                out[k] = np.ascontiguousarray(v)
            else:
                out[k] = v
        return out


def make_grain_loader(
    dataset,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    worker_count: int = 0,
    drop_remainder: bool = True,
    num_hosts: int = 1,
    host_id: int = 0,
):
    """Build a grain DataLoader yielding the framework's batch dicts.

    ``worker_count > 0`` enables multi-process loading (the native SIDPack
    decoder releases the GIL during inflate, so threads/processes scale).
    Host sharding mirrors ``Loader(num_hosts=, host_id=)``.
    """
    grain = _require_grain()
    if batch_size % num_hosts != 0:
        raise ValueError("batch_size must divide across hosts")
    sampler = grain.IndexSampler(
        num_records=len(dataset),
        shard_options=grain.ShardOptions(
            shard_index=host_id, shard_count=num_hosts,
            drop_remainder=drop_remainder,
        ),
        shuffle=shuffle,
        num_epochs=num_epochs,
        seed=seed,
    )
    operations = [
        grain.Batch(batch_size // num_hosts,
                    drop_remainder=drop_remainder),
    ]
    return grain.DataLoader(
        data_source=_Source(dataset),
        sampler=sampler,
        operations=operations,
        worker_count=worker_count,
    )
