#!/usr/bin/env python
"""Convert a torch NAFNet ``state_dict`` to this framework's param tree.

Mapping (torch NCHW -> Flax NHWC):

- ``intro/ending``: ``.weight`` OIHW -> HWIO kernel, ``.bias`` copied.
- ``encoders.{s}.{b}.*`` -> ``enc{s}_blk{b}/*`` (same for decoders/middles
  -> ``dec{s}_blk{b}`` / ``mid_blk{b}``), with block submodules:
  ``conv1..conv5`` 1x1/3x3 convs, ``sca.1`` -> ``sca_conv``,
  ``norm1/2.weight|bias`` -> LN ``weight|bias``, ``beta/gamma``
  ``[1,C,1,1]`` -> ``[C]``.
- ``downs.{s}`` -> ``down{s}``; ``ups.{s}.0`` -> ``up{s}`` (1x1 conv,
  PixelShuffle has no params; channel ordering matches — see
  ``models/nafnet.py:pixel_shuffle``).
- Depthwise ``conv2`` weights ``[C,1,kh,kw]`` -> HWIO ``[kh,kw,1,C]``.

Usage::

    python tools/convert_torch_nafnet.py --checkpoint net_g.pth \
        --output params.npz

The output npz maps flat ``path/to/param`` keys to arrays;
``load_converted_params`` in this module rebuilds the nested tree.
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO; depthwise [C,1,kh,kw] -> [kh,kw,1,C]."""
    return np.transpose(w, (2, 3, 1, 0))


def convert_state_dict(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """torch NAFNet state_dict -> flat ``{path: array}`` flax params."""
    out: Dict[str, np.ndarray] = {}

    def to_np(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                          if hasattr(v, "detach") else v, dtype=np.float32)

    stage_map = {"encoders": "enc", "decoders": "dec", "middle_blks": "mid"}
    for key, val in sd.items():
        arr = to_np(val)
        m = re.match(r"(intro|ending)\.(weight|bias)", key)
        if m:
            name, kind = m.groups()
            out[f"{name}/{'kernel' if kind == 'weight' else 'bias'}"] = (
                _conv_kernel(arr) if kind == "weight" else arr
            )
            continue
        m = re.match(r"(downs)\.(\d+)\.(weight|bias)", key)
        if m:
            _, s, kind = m.groups()
            out[f"down{s}/{'kernel' if kind == 'weight' else 'bias'}"] = (
                _conv_kernel(arr) if kind == "weight" else arr
            )
            continue
        m = re.match(r"(ups)\.(\d+)\.0\.(weight|bias)", key)
        if m:
            _, s, kind = m.groups()
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
    m = re.match(r"sca\.1\.(weight|bias)", rest)
    if m:
        kind = m.group(1)
        out[f"{prefix}/sca_conv/"
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


def flat_to_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


def load_converted_params(npz_path: str) -> Dict[str, Any]:
    return flat_to_tree(dict(np.load(npz_path)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="torch .pth file ({'params': state_dict} or a "
                         "bare state_dict)")
    ap.add_argument("--output", required=True, help="output .npz")
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
