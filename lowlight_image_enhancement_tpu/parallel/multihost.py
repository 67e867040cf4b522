"""Multi-host (multi-slice) training glue.

TPU-native replacement for the reference's process-group launchers
(``dist_util.py:17-65``: env-var RANK / SLURM + NCCL init). In JAX the
equivalent is a single call to :func:`jax.distributed.initialize` per host
process, after which ``jax.devices()`` spans the full slice and a global
``Mesh`` rides ICI within a slice and DCN across slices.

- :func:`init_multihost` — idempotent initialize from env (JAX infers
  coordinator/process-id on TPU pods; explicit args supported for manual
  launches, covering the reference's env-var and SLURM flows).
- :func:`host_info` — (process_index, process_count, is_main) — the
  rank/world_size/rank-0 trio.
- :func:`local_batch_slice` — which slice of the global batch this host
  feeds (pairs with ``data.Loader(num_hosts=, host_id=)``).
- :func:`main_process_only` — decorator mirroring ``@master_only``.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional, Tuple

import jax


def init_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime (no-op if single-process or
    already initialized).

    On TPU pods all arguments are inferred from the environment. For
    manual/SLURM launches pass them explicitly or set
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` /
    ``JAX_PROCESS_ID`` (the reference's RANK/WORLD_SIZE analogue).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process
    state = getattr(jax.distributed, "global_state", None)
    if state is not None and getattr(state, "client", None) is not None:
        return  # already initialized (idempotent re-init)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized (fallback guard)
        msg = str(e).lower()
        if "already" not in msg and "only be called once" not in msg:
            raise


def host_info() -> Tuple[int, int, bool]:
    """-> (process_index, process_count, is_main_process)."""
    idx = jax.process_index()
    cnt = jax.process_count()
    return idx, cnt, idx == 0


def local_batch_slice(global_batch: int) -> Tuple[int, int]:
    """-> (local_batch_size, host_offset) for this host's data shard."""
    idx, cnt, _ = host_info()
    if global_batch % cnt != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {cnt} hosts"
        )
    per = global_batch // cnt
    return per, idx * per


def main_process_only(fn: Callable) -> Callable:
    """Run ``fn`` only on process 0 (reference ``@master_only``)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return fn(*args, **kwargs)
        return None

    return wrapper
