#!/usr/bin/env python
"""Convert a torchvision VGG19 checkpoint to the framework's npz format.

Run on a host with torchvision (or a downloaded ``vgg19-*.pth`` state
dict). Produces ``vgg19_features.npz`` with keys ``conv{s}_{i}.weight`` /
``.bias`` (torch OIHW; the loader transposes to HWIO), consumed by
``models/vgg.py`` via ``$LLIE_VGG19_NPZ`` or
``lowlight_image_enhancement_tpu/weights/vgg19_features.npz``.
"""

from __future__ import annotations

import argparse

import numpy as np

# torchvision vgg19.features conv indices -> our conv names
_IDX_TO_NAME = {
    0: "conv1_1", 2: "conv1_2",
    5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3", 16: "conv3_4",
    19: "conv4_1", 21: "conv4_2", 23: "conv4_3", 25: "conv4_4",
    28: "conv5_1", 30: "conv5_2", 32: "conv5_3", 34: "conv5_4",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="path to a vgg19 state_dict .pth; default: download "
                         "via torchvision")
    ap.add_argument("--output", default="vgg19_features.npz")
    args = ap.parse_args()

    import torch

    if args.checkpoint:
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=True)
    else:
        from torchvision.models import vgg19

        sd = vgg19(weights="IMAGENET1K_V1").state_dict()

    out = {}
    for idx, name in _IDX_TO_NAME.items():
        out[f"{name}.weight"] = sd[f"features.{idx}.weight"].numpy().astype(
            np.float32
        )
        out[f"{name}.bias"] = sd[f"features.{idx}.bias"].numpy().astype(
            np.float32
        )
    np.savez(args.output, **out)
    print(f"wrote {len(out)} arrays to {args.output}")


if __name__ == "__main__":
    main()
