"""Device-mesh data parallelism (TPU-native replacement for DDP/NCCL).

The reference scales with ``DistributedDataParallel`` over NCCL
(``basicsr/utils/dist_util.py:17-65``, ``base_model.py:63-81``): one process
per GPU, implicit gradient all-reduce, explicit ``dist.reduce`` of
loss/metric dicts. The TPU-native design replaces all of that with a
1-D ``jax.sharding.Mesh`` over the ``data`` axis:

- the batch is sharded over ``data`` (leading axis) via NamedSharding,
- params/optimizer state are replicated,
- a single ``jax.jit``-compiled train step lets XLA insert the gradient
  ``all-reduce`` (psum) over ICI automatically — no NCCL, no process
  groups, no explicit collectives in user code,
- "reduce metrics to rank 0" becomes: sharded metric computation + host
  read of the (replicated) scalar.

Multi-host: the same code runs under ``jax.distributed.initialize`` with a
global mesh spanning hosts (DCN); per-host input sharding happens in the
data pipeline (each host feeds its addressable shard).
"""

from __future__ import annotations

from typing import Any, Mapping, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    axis_name: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 1-D data-parallel mesh over available devices."""
    devs = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices, only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Sharding for batch arrays: leading axis split over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, Any], mesh: Mesh,
                axis_name: str = "data"):
    """Device-put a batch dict with the leading axis sharded over the mesh.

    Scalars / 0-d entries are replicated. Batch size must divide the mesh
    size (the input pipeline pads to a multiple).
    """
    n = mesh.devices.size
    bs = batch_sharding(mesh, axis_name)
    rep = replicate_sharding(mesh)

    def put(x):
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, bs)
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map(put, dict(batch))
