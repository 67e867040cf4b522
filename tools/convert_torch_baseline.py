#!/usr/bin/env python
"""Convert a torch Baseline (``Baseline_arch.py:82-161``) ``state_dict``
to this framework's param tree.

Mapping (torch NCHW -> Flax NHWC), mirroring ``convert_torch_nafnet.py``:

- ``intro/ending``: OIHW ``.weight`` -> HWIO ``kernel``; ``.bias`` copied.
- ``encoders.{s}.{b}.*`` -> ``enc{s}_blk{b}/*`` (decoders/middle_blks ->
  ``dec{s}_blk{b}`` / ``mid_blk{b}``) with block submodules:
  ``conv1..conv5``, SE attention ``se.1`` -> ``ca/down`` and ``se.3`` ->
  ``ca/up`` (reduction 2, ``Baseline_arch.py:32-40``),
  ``norm1/2.weight|bias`` -> LN ``weight|bias``, ``beta/gamma``
  ``[1,C,1,1]`` -> ``[C]``.
- ``downs.{s}`` -> ``down{s}``; ``ups.{s}.0`` -> ``up{s}``.
- Depthwise ``conv2`` ``[C,1,kh,kw]`` -> HWIO ``[kh,kw,1,C]``.

Usage::

    python tools/convert_torch_baseline.py --checkpoint net_g.pth \
        --output params.npz
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np

from convert_torch_nafnet import _conv_kernel, flat_to_tree  # noqa: F401


def convert_state_dict(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """torch Baseline state_dict -> flat ``{path: array}`` flax params."""
    out: Dict[str, np.ndarray] = {}

    def to_np(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                          if hasattr(v, "detach") else v, dtype=np.float32)

    stage_map = {"encoders": "enc", "decoders": "dec"}
    for key, val in sd.items():
        arr = to_np(val)
        m = re.match(r"(intro|ending)\.(weight|bias)", key)
        if m:
            name, kind = m.groups()
            out[f"{name}/{'kernel' if kind == 'weight' else 'bias'}"] = (
                _conv_kernel(arr) if kind == "weight" else arr
            )
            continue
        m = re.match(r"downs\.(\d+)\.(weight|bias)", key)
        if m:
            s, kind = m.groups()
            out[f"down{s}/{'kernel' if kind == 'weight' else 'bias'}"] = (
                _conv_kernel(arr) if kind == "weight" else arr
            )
            continue
        m = re.match(r"ups\.(\d+)\.0\.(weight|bias)", key)
        if m:
            s, kind = m.groups()
            out[f"up{s}/{'kernel' if kind == 'weight' else 'bias'}"] = (
                _conv_kernel(arr) if kind == "weight" else arr
            )
            continue
        m = re.match(
            r"(encoders|decoders)\.(\d+)\.(\d+)\.(.+)", key
        ) or re.match(r"(middle_blks)\.()(\d+)\.(.+)", key)
        if m:
            stage, s, b, rest = m.groups()
            prefix = (f"{stage_map[stage]}{s}_blk{b}" if s != ""
                      else f"mid_blk{b}")
            out.update(_convert_block_param(prefix, rest, arr))
            continue
    return out


def _convert_block_param(prefix: str, rest: str,
                         arr: np.ndarray) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    m = re.match(r"conv(\d)\.(weight|bias)", rest)
    if m:
        idx, kind = m.groups()
        out[f"{prefix}/conv{idx}/"
            f"{'kernel' if kind == 'weight' else 'bias'}"] = (
            _conv_kernel(arr) if kind == "weight" else arr
        )
        return out
    # SE attention: Sequential(GAP, Conv(dw->dw/2), ReLU, Conv(dw/2->dw),
    # Sigmoid) -> indices 1 and 3 carry the params
    m = re.match(r"se\.([13])\.(weight|bias)", rest)
    if m:
        idx, kind = m.groups()
        sub = "down" if idx == "1" else "up"
        out[f"{prefix}/ca/{sub}/"
            f"{'kernel' if kind == 'weight' else 'bias'}"] = (
            _conv_kernel(arr) if kind == "weight" else arr
        )
        return out
    m = re.match(r"norm(\d)\.(weight|bias)", rest)
    if m:
        idx, kind = m.groups()
        out[f"{prefix}/norm{idx}/{kind}"] = arr.reshape(-1)
        return out
    if rest in ("beta", "gamma"):
        out[f"{prefix}/{rest}"] = arr.reshape(-1)
        return out
    return out


def load_converted_params(npz_path: str) -> Dict[str, Any]:
    return flat_to_tree(dict(np.load(npz_path)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    import torch

    ckpt = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=True)
    sd = ckpt.get("params", ckpt) if isinstance(ckpt, dict) else ckpt
    flat = convert_state_dict(sd)
    np.savez(args.output, **flat)
    print(f"converted {len(flat)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
