#!/usr/bin/env python
"""Convert official LPIPS v0.1 weights to the framework's npz format.

Run on a host with the ``lpips`` package (or its checkpoint files).
Produces ``lpips_{alex,vgg}.npz`` with keys:

- ``trunk.conv*.weight`` / ``.bias`` — backbone convs (torch OIHW),
- ``lin{i}.weight`` — the 1x1 linear-head weights ``[C]``.

Consumed by ``models/lpips.py`` via ``$LLIE_LPIPS_NPZ`` or
``lowlight_image_enhancement_tpu/weights/lpips_{net}.npz``.
"""

from __future__ import annotations

import argparse

import numpy as np

_ALEX_MAP = {  # torch alexnet features idx -> trunk conv name
    0: "conv1", 3: "conv2", 6: "conv3", 8: "conv4", 10: "conv5",
}
_VGG_MAP = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3",
    17: "conv4_1", 19: "conv4_2", 21: "conv4_3",
    24: "conv5_1", 26: "conv5_2", 28: "conv5_3",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="alex", choices=["alex", "vgg"])
    ap.add_argument("--output", default=None)
    args = ap.parse_args()

    import lpips as lpips_pkg  # noqa: F401 — requires the lpips package
    import torch

    model = lpips_pkg.LPIPS(net=args.net, version="0.1")
    sd = model.state_dict()
    idx_map = _ALEX_MAP if args.net == "alex" else _VGG_MAP

    out = {}
    for key, val in sd.items():
        arr = val.detach().cpu().numpy().astype(np.float32)
        if key.startswith("net.slice"):
            # e.g. net.slice1.0.weight — torch module index inside slices
            continue  # handled via net.features below when present
        if key.startswith("lin") and key.endswith(".model.1.weight"):
            li = int(key[3])
            out[f"lin{li}.weight"] = arr.reshape(-1)
    # backbone weights live under net.<name> with varying layouts across
    # lpips versions; fall back to iterating named_parameters of the trunk
    for name, param in model.net.named_parameters():
        arr = param.detach().cpu().numpy().astype(np.float32)
        # name like 'slice1.0.weight' — recover the features index
        parts = name.split(".")
        try:
            feat_idx = int(parts[1])
        except (IndexError, ValueError):
            continue
        # slices restart indexing; reconstruct absolute index by walking
        # torchvision's layout is already flattened in .features for both
        # nets inside lpips' implementation
        conv_name = idx_map.get(feat_idx)
        if conv_name is None:
            continue
        kind = parts[-1]  # weight | bias
        out[f"trunk.{conv_name}.{kind}"] = arr

    output = args.output or f"lpips_{args.net}.npz"
    np.savez(output, **out)
    print(f"wrote {len(out)} arrays to {output}")


if __name__ == "__main__":
    main()
