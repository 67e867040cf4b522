#!/usr/bin/env python
"""Convert an InceptionV3 torch checkpoint to the framework's npz format.

Run on a host with the weights available; two supported sources:

- pytorch-fid's FID InceptionV3 (``pt_inception-2015-12-05-*.pth`` — the
  checkpoint every published FID number uses), or
- torchvision's ``inception_v3`` ImageNet state dict.

Produces ``inception_v3_fid.npz`` keeping the torch state-dict names
verbatim (``Mixed_5b.branch1x1.conv.weight``,
``....bn.running_mean`` ...); the loader
(``models/inception.py:_npz_to_params``) transposes conv kernels
OIHW -> HWIO. Consumed via ``$LLIE_INCEPTION_NPZ`` or
``lowlight_image_enhancement_tpu/weights/inception_v3_fid.npz``.

Reference contract: ``NAFNet_base/basicsr/metrics/fid.py:14-25``
(``InceptionV3([3], resize_input=True, normalize_input=False)``).
"""

from __future__ import annotations

import argparse

import numpy as np

# Trunk prefixes needed for pool3 features (fc/AuxLogits excluded).
_TRUNK_PREFIXES = (
    "Conv2d_1a_3x3", "Conv2d_2a_3x3", "Conv2d_2b_3x3", "Conv2d_3b_1x1",
    "Conv2d_4a_3x3", "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
    "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a",
    "Mixed_7b", "Mixed_7c",
)


def convert_state_dict(sd) -> dict:
    """Filter a torch state dict down to the pool3 trunk's conv/bn
    arrays, as float32 numpy with names unchanged."""
    out = {}
    for key, val in sd.items():
        if not key.startswith(_TRUNK_PREFIXES):
            continue
        if key.endswith("num_batches_tracked"):
            continue
        out[key] = np.asarray(val.detach().cpu().numpy(),
                              dtype=np.float32)
    expected_per_conv = 5  # conv.weight + 4 bn arrays
    n_convs = sum(1 for k in out if k.endswith(".conv.weight"))
    if n_convs != 94:
        raise ValueError(
            f"expected 94 trunk convs, found {n_convs} — is this an "
            "InceptionV3 state dict?")
    if len(out) != n_convs * expected_per_conv:
        raise ValueError(
            f"unexpected array count {len(out)} for {n_convs} convs")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None,
                    help="path to an InceptionV3 state_dict .pth "
                         "(pytorch-fid pt_inception or torchvision); "
                         "default: download via torchvision")
    ap.add_argument("--output", default="inception_v3_fid.npz")
    args = ap.parse_args()

    import torch

    if args.checkpoint:
        sd = torch.load(args.checkpoint, map_location="cpu",
                        weights_only=True)
        if not any(k.startswith("Mixed_5b") for k in sd):
            # pytorch-fid wraps blocks in an InceptionV3 module whose
            # state dict is flat module-path keyed already; torchvision
            # fc-era checkpoints are too. Anything else is unsupported.
            raise ValueError("unrecognized InceptionV3 state dict layout")
    else:
        from torchvision.models import inception_v3

        sd = inception_v3(weights="IMAGENET1K_V1").state_dict()

    out = convert_state_dict(sd)
    np.savez(args.output, **out)
    print(f"wrote {len(out)} arrays to {args.output}")


if __name__ == "__main__":
    main()
