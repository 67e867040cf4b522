"""Profiling / tracing utilities (aux subsystem).

The reference has no profiler integration — only bespoke timers (SURVEY.md
§5). The TPU framework adds first-class tracing on top of ``jax.profiler``:

- :func:`trace` — context manager writing an xprof/TensorBoard trace.
- :func:`annotate` — named ``TraceAnnotation`` regions for the timeline.
- :func:`chained_timeit` — the **measurement-honest** timing helper: each
  iteration's input is derived from the previous output, so backends that
  execute independent dispatches concurrently (see BASELINE.md) cannot
  inflate the number.
- :func:`summarize_trace` — parse a captured trace and return device-time
  totals per op family (what ``tools/profile_train.py`` prints).
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import re
import time
from typing import Callable, Dict, Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an xprof trace of the enclosed block (viewable in
    TensorBoard's profile plugin)."""
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named region on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


def chained_timeit(
    fn: Callable,
    init,
    *,
    chain: Callable = lambda out, prev: out,
    runs: int = 20,
    warmup: int = 3,
) -> float:
    """Per-iteration wall time (ms) with a forced data dependency.

    ``fn(x) -> y`` is iterated as ``x_{i+1} = chain(fn(x_i), x_i)``; the
    dependency chain defeats concurrent execution of "independent" repeats
    (which otherwise under-reports latency by the backend's hidden
    parallelism — measured >10x on hosted tunnels, see BASELINE.md).
    """
    x = init
    for _ in range(warmup):
        x = chain(fn(x), x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(runs):
        x = chain(fn(x), x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / runs * 1e3


def summarize_trace(log_dir: str, top: int = 20) -> Dict[str, float]:
    """Device-time (ms) per op family from the newest trace under
    ``log_dir``. Returns ``{family: total_ms}`` sorted descending."""
    paths = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {pid for pid, name in pids.items()
                   if name and "TPU" in str(name)}
    fam: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            name = e["name"]
            if name.startswith("jit_") or re.fullmatch(r"\d+", name):
                continue
            fam[re.sub(r"\.\d+$", "", name)] += e.get("dur", 0)
    return {k: v / 1e3 for k, v in fam.most_common(top)}
