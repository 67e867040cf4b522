#!/usr/bin/env python
"""Convert an official SwinIR torch checkpoint to this framework's tree.

The reference wraps the official external SwinIR clone
(``archs/swinir_arch.py:14-70``); users migrating from it hold checkpoints
in the official ``network_swinir.py`` state_dict naming. Mapping (torch
NCHW / ``[out, in]`` Linear -> Flax NHWC / ``[in, out]`` Dense):

- ``conv_first|conv_after_body|conv_last``: OIHW -> HWIO ``kernel``+``bias``
- ``patch_embed.norm`` -> ``patch_embed_norm`` (LN ``weight``->``scale``)
- ``layers.{i}.residual_group.blocks.{j}.X`` -> ``rstb{i}/blk{j}/X`` with
  ``norm1|norm2`` -> LN scale/bias, ``attn.qkv|attn.proj`` -> Dense
  kernel (transposed) + bias, ``attn.relative_position_bias_table`` ->
  ``attn/relative_position_bias`` (same layout),
  ``mlp.fc1|mlp.fc2`` -> ``fc1|fc2``
- ``layers.{i}.conv`` -> ``rstb{i}/conv``
- ``norm`` (final body LN) -> ``norm``
- buffers (``relative_position_index``, ``attn_mask``) are derived
  deterministically at trace time here and skipped.

Usage::

    python tools/convert_torch_swinir.py --checkpoint swinir.pth \
        --output params.npz
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np

from convert_torch_nafnet import _conv_kernel, flat_to_tree  # noqa: F401


def convert_state_dict(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """Official SwinIR state_dict -> flat ``{path: array}`` flax params."""
    out: Dict[str, np.ndarray] = {}

    def to_np(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                          if hasattr(v, "detach") else v, dtype=np.float32)

    for key, val in sd.items():
        if key.endswith(("relative_position_index", "attn_mask")):
            continue  # derived buffers
        arr = to_np(val)
        m = re.match(r"(conv_first|conv_after_body|conv_last)\."
                     r"(weight|bias)", key)
        if m:
            name, kind = m.groups()
            out[f"{name}/{'kernel' if kind == 'weight' else 'bias'}"] = (
                _conv_kernel(arr) if kind == "weight" else arr
            )
            continue
        m = re.match(r"patch_embed\.norm\.(weight|bias)", key)
        if m:
            kind = m.group(1)
            out[f"patch_embed_norm/"
                f"{'scale' if kind == 'weight' else 'bias'}"] = arr
            continue
        m = re.match(r"norm\.(weight|bias)", key)
        if m:
            kind = m.group(1)
            out[f"norm/{'scale' if kind == 'weight' else 'bias'}"] = arr
            continue
        m = re.match(r"layers\.(\d+)\.conv\.(weight|bias)", key)
        if m:
            i, kind = m.groups()
            out[f"rstb{i}/conv/"
                f"{'kernel' if kind == 'weight' else 'bias'}"] = (
                _conv_kernel(arr) if kind == "weight" else arr
            )
            continue
        m = re.match(
            r"layers\.(\d+)\.residual_group\.blocks\.(\d+)\.(.+)", key)
        if m:
            i, j, rest = m.groups()
            out.update(_convert_block_param(f"rstb{i}/blk{j}", rest, arr))
            continue
    return out


def _convert_block_param(prefix: str, rest: str,
                         arr: np.ndarray) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    m = re.match(r"norm([12])\.(weight|bias)", rest)
    if m:
        idx, kind = m.groups()
        out[f"{prefix}/norm{idx}/"
            f"{'scale' if kind == 'weight' else 'bias'}"] = arr
        return out
    m = re.match(r"attn\.(qkv|proj)\.(weight|bias)", rest)
    if m:
        name, kind = m.groups()
        out[f"{prefix}/attn/{name}/"
            f"{'kernel' if kind == 'weight' else 'bias'}"] = (
            arr.T if kind == "weight" else arr   # Linear [out,in]->[in,out]
        )
        return out
    if rest == "attn.relative_position_bias_table":
        out[f"{prefix}/attn/relative_position_bias"] = arr
        return out
    m = re.match(r"mlp\.fc([12])\.(weight|bias)", rest)
    if m:
        idx, kind = m.groups()
        out[f"{prefix}/fc{idx}/"
            f"{'kernel' if kind == 'weight' else 'bias'}"] = (
            arr.T if kind == "weight" else arr
        )
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
    sd = ckpt
    if isinstance(ckpt, dict):
        for k in ("params", "params_ema", "state_dict", "model"):
            if k in ckpt:
                sd = ckpt[k]
                break
    flat = convert_state_dict(sd)
    np.savez(args.output, **flat)
    print(f"converted {len(flat)} tensors -> {args.output}")


if __name__ == "__main__":
    main()
