"""Device-event inference latency measurement (TPU-native).

Rebuild of reference ``metrics/inference_time.py:16-75`` (CUDA events, 20
warmup + 100 timed runs, sync before/after, ms/image = total/(runs*batch))
using the JAX equivalents: ``block_until_ready`` fencing around a batch of
dispatches. The API contract (warmup/runs/ms-per-image) is preserved.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax


def measure_inference_time(
    fn: Callable[..., Any],
    *args,
    warmup: int = 20,
    runs: int = 100,
    batch_size: int = 1,
) -> Dict[str, float]:
    """Measure steady-state latency of ``fn(*args)``.

    ``fn`` should be a jitted callable; the first calls trigger compilation
    and are excluded by the warmup phase. All ``runs`` timed calls are
    dispatched inside one fence pair (mirroring the reference's single
    CUDA-event pair around the loop), so per-call Python overhead is
    amortized the same way.

    Returns ``{"ms_per_image", "ms_per_batch", "total_s", "runs",
    "warmup", "batch_size"}``.
    """
    if warmup < 0 or runs <= 0 or batch_size <= 0:
        raise ValueError("warmup >= 0, runs > 0, batch_size > 0 required")

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out) if warmup else None

    start = time.perf_counter()
    outs = None
    for _ in range(runs):
        outs = fn(*args)
    jax.block_until_ready(outs)
    total = time.perf_counter() - start

    ms_per_batch = total * 1e3 / runs
    return {
        "ms_per_image": ms_per_batch / batch_size,
        "ms_per_batch": ms_per_batch,
        "total_s": total,
        "runs": float(runs),
        "warmup": float(warmup),
        "batch_size": float(batch_size),
    }
