"""Collective-structure introspection of compiled sharded programs.

The reference's data-parallel contract is DDP's implicit single-bucket
gradient all-reduce (``basicsr/models/base_model.py:72-81``). The
TPU-native equivalent is whatever collectives the XLA SPMD partitioner
inserts for the sharded train step — this module makes that structure
inspectable so tests can pin it (one bulk gradient all-reduce per step;
ZeRO-1 adds its gather) and regressions (e.g. an accidental per-layer
all-reduce storm, or a resharding that silently all-gathers activations)
cannot land silently.

Works on the optimized HLO text of a compiled executable
(``jit(f).lower(*args).compile().as_text()``).
"""

from __future__ import annotations

import re
from typing import Any, Dict

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "f8e4m3fn": 1, "f8e5m2": 1,
    "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4,
    "s64": 8, "u64": 8, "f64": 8, "c64": 8,
    "c128": 16,
}

# collective op kinds we account for; "-start" forms are the async TPU
# variants (the "-done" halves are skipped to avoid double counting)
_KINDS = ("all-reduce", "reduce-scatter", "all-gather",
          "collective-permute", "all-to-all")

_SHAPE_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _shape_bytes(shape_text: str) -> int:
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collective_stats(hlo_text: str) -> Dict[str, Dict[str, Any]]:
    """Per-kind ``{count, bytes, shapes}`` of the collectives in an
    optimized HLO module text.

    ``bytes`` sums the OUTPUT buffer sizes (for a variadic all-reduce,
    all tuple elements). Async pairs (``all-reduce-start`` /
    ``all-reduce-done``) count once.
    """
    stats: Dict[str, Dict[str, Any]] = {}
    for line in hlo_text.splitlines():
        if "=" not in line:
            continue
        for kind in _KINDS:
            # match "<shape> kind(" or "<shape> kind-start(" as the op
            m = re.search(
                r"=\s*(.*?)\s+" + re.escape(kind) + r"(-start)?\(", line)
            if m is None:
                continue
            if f"{kind}-done" in line:
                continue
            b = _shape_bytes(m.group(1))
            entry = stats.setdefault(kind, {"count": 0, "bytes": 0,
                                            "shapes": []})
            entry["count"] += 1
            entry["bytes"] += b
            entry["shapes"].append(m.group(1).strip())
            break
    return stats


def compiled_collective_stats(jitted_fn, *args) -> Dict[str, Dict[str, Any]]:
    """Lower + compile ``jitted_fn`` at ``args`` (AOT; hits the
    persistent compile cache when warm) and return its collective
    stats. ``args`` may be concrete (sharded) arrays or
    ShapeDtypeStructs carrying shardings."""
    compiled = jitted_fn.lower(*args).compile()
    return collective_stats(compiled.as_text())


def bulk_and_scalar(stats: Dict[str, Dict[str, Any]],
                    bulk_threshold_bytes: int = 4096):
    """Split a kind's stats into bulk (>= threshold) and scalar/control
    collectives — the invariant worth pinning is about the BULK ones
    (gradients), while tiny scalar reductions (loss logs) are free to
    fuse however XLA likes."""
    out = {}
    for kind, entry in stats.items():
        bulk = [s for s in entry["shapes"]
                if _shape_bytes(s) >= bulk_threshold_bytes]
        scalar = [s for s in entry["shapes"]
                  if _shape_bytes(s) < bulk_threshold_bytes]
        out[kind] = {
            "bulk_count": len(bulk),
            "bulk_bytes": sum(_shape_bytes(s) for s in bulk),
            "scalar_count": len(scalar),
        }
    return out
