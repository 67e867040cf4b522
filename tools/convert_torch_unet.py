#!/usr/bin/env python
"""Convert a torch ``UNetSID`` state_dict to this framework's param tree.

Mapping (reference ``NAFNet_base/basicsr/models/archs/unet_sid_arch.py``,
torch NCHW -> Flax NHWC):

- ``inc.block.{0,2}``            -> ``inc/conv{1,2}``
- ``down_layers.{i}.block.1.block.{0,2}`` -> ``down{i+1}/conv{1,2}``
- ``bottom.block.{0,2}``         -> ``bottom/conv{1,2}``
- ``up_layers.{i}.up``           -> ``upconv{i+1}`` (ConvTranspose2d;
  weight ``[in, out, kh, kw]`` -> HWIO ``[kh, kw, in, out]`` **spatially
  flipped**: ``lax.conv_transpose`` is a correlation on the
  stride-dilated input, so the taps land mirrored relative to torch's
  scatter — verified numerically in ``tests/test_torch_parity.py``)
- ``up_layers.{i}.conv.block.{0,2}`` -> ``up{i+1}/conv{1,2}``
- ``outc``                        -> ``outc``

Regular conv weights OIHW -> HWIO. Only the reference's **working**
graph converts (``bilinear=False``); its default bilinear graph is
structurally broken (channel mismatch — see ``models/unet.py`` docstring)
and has no checkpoints to convert.

Usage::

    python tools/convert_torch_unet.py --checkpoint net_g.pth \
        --output params.npz
"""

from __future__ import annotations

import argparse
import re
from typing import Any, Dict

import numpy as np

from convert_torch_nafnet import flat_to_tree  # noqa: F401 (re-export)


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _convt_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d [in, out, kh, kw] -> flax HWIO [kh, kw, in,
    out], spatially flipped (see module docstring)."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def convert_unet_state_dict(sd: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """torch UNetSID state_dict -> flat ``{path: array}`` flax params."""
    out: Dict[str, np.ndarray] = {}
    unknown = []

    def to_np(v):
        return np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                          if hasattr(v, "detach") else v, dtype=np.float32)

    def put_conv(prefix: str, kind: str, arr: np.ndarray,
                 transposed: bool = False):
        if kind == "weight":
            out[f"{prefix}/kernel"] = (
                _convt_kernel(arr) if transposed else _conv_kernel(arr))
        else:
            out[f"{prefix}/bias"] = arr

    conv_idx = {"0": "conv1", "2": "conv2"}
    for key, val in sd.items():
        arr = to_np(val)
        m = re.fullmatch(r"inc\.block\.([02])\.(weight|bias)", key)
        if m:
            put_conv(f"inc/{conv_idx[m.group(1)]}", m.group(2), arr)
            continue
        m = re.fullmatch(
            r"down_layers\.(\d+)\.block\.1\.block\.([02])\.(weight|bias)",
            key)
        if m:
            i, ci, kind = m.groups()
            put_conv(f"down{int(i) + 1}/{conv_idx[ci]}", kind, arr)
            continue
        m = re.fullmatch(r"bottom\.block\.([02])\.(weight|bias)", key)
        if m:
            put_conv(f"bottom/{conv_idx[m.group(1)]}", m.group(2), arr)
            continue
        m = re.fullmatch(r"up_layers\.(\d+)\.up\.(weight|bias)", key)
        if m:
            i, kind = m.groups()
            put_conv(f"upconv{int(i) + 1}", kind, arr, transposed=True)
            continue
        m = re.fullmatch(
            r"up_layers\.(\d+)\.conv\.block\.([02])\.(weight|bias)", key)
        if m:
            i, ci, kind = m.groups()
            put_conv(f"up{int(i) + 1}/{conv_idx[ci]}", kind, arr)
            continue
        m = re.fullmatch(r"outc\.(weight|bias)", key)
        if m:
            put_conv("outc", m.group(1), arr)
            continue
        unknown.append(key)
    if unknown:
        raise ValueError(
            "unmapped torch UNetSID keys (bilinear graph, or not a "
            f"UNetSID checkpoint?): {unknown[:8]}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--param-key", default="params",
                    help="key inside the .pth dict (reference saves "
                    "{'params': state_dict}); falls back to the raw dict")
    args = ap.parse_args()

    import torch

    blob = torch.load(args.checkpoint, map_location="cpu",
                      weights_only=True)
    sd = blob.get(args.param_key, blob) if isinstance(blob, dict) else blob
    flat = convert_unet_state_dict(sd)
    np.savez(args.output, **flat)
    print(f"wrote {len(flat)} arrays -> {args.output}")


if __name__ == "__main__":
    main()
